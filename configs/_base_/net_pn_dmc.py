_base_ = ["./sac_agent.py"]

# PointNet actor/critic networks for DM Control point-cloud observations.
# Feature sizes resolve against the live env via placeholders.

agent_cfg = dict(
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
