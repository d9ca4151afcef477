_base_ = ["./sac_agent.py"]

# PointNet actor/critic networks for DM Control point-cloud observations.
# Feature sizes resolve against the live env via placeholders.

# The TPU-shaped hot path is the default for pointcloud configs: transitions
# live in HBM and each gradient step is a fused on-device sample+update —
# no 20+ MB host->device batch copy per update.  bf16 runs the matmuls on
# the MXU at ~1.5x the f32 update rate (params/LN/losses stay f32).
# Multi-worker pipelined collection overlaps policy fetches with host sims.
# Obs transfer: the FrameStack pos_encoding block is a constant one-hot —
# drop it from uploads/HBM storage and re-synthesize it on device (EXACT,
# see algorithms/obs_transfer.py; tests/test_obs_transfer.py pins act +
# update bit-parity).  Cuts act-dispatch payload by pos_rows/(all channels)
# and replay obs storage/upload the same.
replay_cfg = dict(type="DeviceReplayMemory", capacity=100000,
                  transfer_cfg=dict(drop_subkeys=("pos_encoding",)))
rollout_cfg = dict(type="Rollout", num_procs=4)
# 4 env steps : 4 updates per cycle — the same 1:1 update-to-data ratio as
# the reference's n_steps=1/n_updates=1, batched so the 4 workers step
# together and the updates dispatch as one scanned program.
train_cfg = dict(n_steps=4, n_updates=4)

agent_cfg = dict(
    bf16=True,
    obs_transfer_cfg=dict(pos_encoding_on_device=True),
    actor_cfg=dict(
        type="ContinuousActor",
        head_cfg=dict(type="TanhGaussianHead", log_std_bound=[-10, 2]),
        nn_cfg=dict(
            type="Visuomotor",
            visual_nn_cfg=dict(
                type="PointNet",
                feat_dim="pcd_all_channel",
                mlp_spec=[64, 128, 256],
                out_channels=50,
                feature_transform=[],
                ignore_first_ln=True,
            ),
            mlp_cfg=dict(
                type="LinearMLP",
                norm_cfg=None,
                mlp_spec=[50, 1024, 1024, "action_shape * 2"],
                inactivated_output=True,
            ),
        ),
        optim_cfg=dict(type="Adam", lr=1e-3, param_cfg={"(.*?)visual_nn(.*?)": None}),
    ),
    critic_cfg=dict(
        type="ContinuousCritic",
        num_heads=2,
        nn_cfg=dict(
            type="Visuomotor",
            visual_nn_cfg=None,  # shared with the actor
            mlp_cfg=dict(
                type="LinearMLP",
                norm_cfg=None,
                mlp_spec=["50 + action_shape", 1024, 1024, 1],
                inactivated_output=True,
            ),
        ),
        optim_cfg=dict(type="Adam", lr=1e-3),
    ),
)

env_cfg = dict(
    type="gym",
    env_name="dmc_cheetah_run-v0",
    obs_mode="pointcloud",
    stack_frame=3,
)
