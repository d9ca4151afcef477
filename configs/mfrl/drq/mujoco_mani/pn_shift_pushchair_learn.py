# PushChairMJC (dual-arm A2) learning-evidence run: DrQ+PointNet with the
# staged-gate quantities from env/chair_task.py:_compute_reward (reference
# mani_skill/env/push_chair.py:215-283) decomposed into the train logs.
# Budgeted for the single tunneled chip: checkpoints every 10k + replay
# snapshots so a relay death costs at most one chunk.
_base_ = ["./pn_shift_pushchair.py"]

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
            dist_pos=[True, "min", "mean"],
            dist_ori=[True, "min", "mean"],
            actor_vel_norm=[True, "max", "mean"],
        )
    ),
)
