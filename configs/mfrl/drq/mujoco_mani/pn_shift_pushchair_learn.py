# PushChairMJC (dual-arm A2) learning-evidence run: DrQ+PointNet with the
# staged-gate quantities from env/chair_task.py:_compute_reward (reference
# mani_skill/env/push_chair.py:215-283) decomposed into the train logs.
# Budgeted for the single tunneled chip: checkpoints every 10k + replay
# snapshots so a relay death costs at most one chunk.
_base_ = ["./pn_shift_pushchair.py"]

# TPU wall-clock shaping — same measured recipe as
# pn_shift_opencabinetdoor_learn.py (HBM-resident f16 replay, packed f16
# act uploads, bf16 matmuls, 8 workers; reference 1:4 update ratio kept).
agent_cfg = dict(
    bf16=True,
    obs_transfer_cfg=dict(pack_dtype="float16"),
)

replay_cfg = dict(
    type="DeviceReplayMemory",
    transfer_cfg=dict(dtype_map=dict(xyz="float16", rgb="float16", seg="float16")),
)

rollout_cfg = dict(num_procs=8)

train_cfg = dict(
    n_steps=8,
    n_updates=2,
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
