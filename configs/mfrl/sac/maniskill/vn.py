# SAC with the SO(3)-equivariant Vector-Neurons point encoder on
# OpenCabinetDrawer.  Parity target: reference configs/mfrl/sac/maniskill/vn.py
# (VNPointNet mlp_spec=[128,128,256], out_channels=128, n_knn=4; shared
# backbone, detached actor feature).  The reference never shipped the
# VNPointNet implementation (config-referenced but absent, SURVEY.md §2.3);
# ours is models/vn.py.
#
# Differences from the maniskill PointNet base kept on purpose to match the
# reference vn.py exactly: no zero_out_indices on the actor MLP, plain env
# flags (no ext-torque/cos-sin/reward-scale), 2 rollout procs, 500k steps
# with n_steps=2.
_base_ = ["../../../_base_/net_pn_maniskill.py"]

agent_cfg = dict(
    actor_cfg=dict(
        nn_cfg=dict(
            visual_nn_cfg=dict(
                _delete_=True,
                type="VNPointNet",
                feat_dim="pcd_all_channel",
                mlp_spec=[128, 128, 256],
                out_channels=128,
                n_knn=4,
            ),
            mlp_cfg=dict(zero_out_indices=None),
        ),
    ),
)

env_cfg = dict(
    _delete_=True,
    type="gym",
    env_name="OpenCabinetDrawer_1000-v0",
    obs_mode="pointcloud",
    ego_mode=True,
    no_early_stop=True,
)

rollout_cfg = dict(type="Rollout", num_procs=2)

train_cfg = dict(
    total_steps=500000,
    warm_steps=1000,
    n_steps=2,
    n_updates=1,
    n_eval=100000,
    n_checkpoint=100000,
)
