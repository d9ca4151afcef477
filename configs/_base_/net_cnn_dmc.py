_base_ = ["./sac_agent.py"]

# SAC-AE style CNN actor/critic networks for DM Control image observations.

agent_cfg = dict(
    actor_cfg=dict(
        type="ContinuousActor",
        head_cfg=dict(type="TanhGaussianHead", log_std_bound=[-10, 2]),
        nn_cfg=dict(
            type="Visuomotor",
            visual_nn_cfg=dict(
                type="DMCEncoder",
                in_channels="image_channels",
                out_channels=50,
                image_size="image_size",
                conv_init_cfg=dict(type="delta_orthogonal_init", gain=1.414),
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
    obs_mode="rgb",
    stack_frame=3,
)
