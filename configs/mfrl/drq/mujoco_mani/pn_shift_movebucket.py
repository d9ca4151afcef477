# DrQ + PointNet on the REAL-physics MoveBucket benchmark (MuJoCo +
# PartNet-Mobility assets; reference task mani_skill/env/move_bucket.py,
# reference config configs/mfrl/drq/maniskill/pn_shift.py): per-level bucket
# sampling from the benchmark's train split, fused multi-camera pointclouds
# with segmentation, staged dense rewards, success flags with hysteresis.
_base_ = ["../maniskill/base/pn_base.py"]

agent_cfg = dict(
    obs_aug=dict(
        type="GlobalRotScaleTrans",
        main_key="xyz",
        req_keys=["xyz"],
        rot_range=None,
        scale_ratio_range=None,
        translation_range=[0.1, 0.1, 0.1],
        shift_height=True,
    ),
)

env_cfg = dict(
    _delete_=True,
    type="gym",
    env_name="MoveBucketMJC_train-v0",
    obs_mode="pointcloud",
    ego_mode=False,
    reward_scale=0.3,
)

eval_cfg = dict(env_cfg=dict(_delete_=True, env_name="MoveBucketMJC_val-v0"))

train_cfg = dict(
    total_steps=1000000,
    n_steps=4,
    ep_stats_cfg=dict(info_keys_mode=dict(success=[True, "max", "all"])),
)
