# MoveBucketMJC (mobile A2 dual arm, the env default) learning-evidence
# run: 100k steps of
# DrQ+PointNet with per-stage reward decomposition in the train logs
# (stage_reward and the staged-gate quantities from
# env/mujoco_manipulation.py:_compute_reward, reference
# mani_skill/env/move_bucket.py:184-356).  Budgeted for the single
# tunneled chip: checkpoints every 10k + replay snapshots so a relay
# death costs at most one chunk.
_base_ = ["./pn_shift_movebucket.py"]

train_cfg = dict(
    total_steps=100000,
    n_checkpoint=10000,
    save_replay=25000,
    stall_timeout=1800,
    ep_stats_cfg=dict(
        info_keys_mode=dict(
            success=[True, "max", "all"],
            stage_reward=[True, "max", "all"],
            dist_ee_actor=[True, "min", "mean"],
            bucket_height=[True, "max", "mean"],
            dist_pos=[True, "min", "mean"],
        )
    ),
)
