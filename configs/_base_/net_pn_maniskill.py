_base_ = ["./sac_agent.py"]

# PointNet networks sized for ManiSkill (richer clouds + robot state vector),
# with the ManiSkill env/convention flags and the 4-env rollout.

agent_cfg = dict(
    gamma=0.95,
    actor_cfg=dict(
        type="ContinuousActor",
        head_cfg=dict(type="TanhGaussianHead", log_std_bound=[-10, 2]),
        nn_cfg=dict(
            type="Visuomotor",
            visual_nn_cfg=dict(
                type="PointNet",
                feat_dim="pcd_all_channel",
                mlp_spec=[128, 128, 256],
                out_channels=128,
                feature_transform=[],
                ignore_first_ln=True,
            ),
            mlp_cfg=dict(
                type="LinearMLP",
                norm_cfg=None,
                mlp_spec=["128 + agent_shape", 1024, 1024, "action_shape * 2"],
                inactivated_output=True,
                zero_out_indices=slice("action_shape", None, None),
            ),
        ),
        optim_cfg=dict(type="Adam", lr=1e-3, param_cfg={"(.*?)visual_nn(.*?)": None}),
    ),
    critic_cfg=dict(
        type="ContinuousCritic",
        num_heads=2,
        nn_cfg=dict(
            type="Visuomotor",
            visual_nn_cfg=None,
            mlp_cfg=dict(
                type="LinearMLP",
                norm_cfg=None,
                mlp_spec=["128 + agent_shape + action_shape", 1024, 1024, 1],
                inactivated_output=True,
            ),
        ),
        optim_cfg=dict(type="Adam", lr=1e-3),
    ),
)

env_cfg = dict(
    type="gym",
    env_name="PushChair_3001-v0",
    obs_mode="pointcloud",
    ego_mode=True,
    no_early_stop=True,
    with_ext_torque=True,
    cos_sin_representation=True,
    reward_scale=0.3,
)

rollout_cfg = dict(type="Rollout", num_procs=4)

eval_cfg = dict(env_cfg=dict(no_early_stop=False))

train_cfg = dict(
    total_steps=1000000,
    warm_steps=1000,
    n_steps=4,
    n_updates=1,
)
