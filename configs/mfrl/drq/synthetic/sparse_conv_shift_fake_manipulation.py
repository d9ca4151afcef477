# DrQ + SparseConv (voxelized) encoder on the synthetic manipulation env:
# the full ManiSkill-config training stack — seg-balanced pcd_base sampling,
# 1200-point clouds, shift augmentation, voxel encoder, success-rate logging —
# exercised end-to-end without the SAPIEN simulator
# (reference configs/mfrl/drq/maniskill/sparse_conv_shift.py).
_base_ = ["../maniskill/base/sparse_conv_base.py"]

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
    env_name="FakeManipulation-v0",
    ego_mode=False,
    reward_scale=1.0,
)

train_cfg = dict(
    total_steps=100000,
    n_steps=4,
    # ManiSkill-style success metrics reach the train logs
    # (reference EpisodicStatistics info_keys_mode, train_rl.py:16-24)
    ep_stats_cfg=dict(info_keys_mode=dict(success=[True, "max", "all"])),
)
