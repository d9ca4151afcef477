replay_cfg = dict(
    type='ReplayMemory',
    capacity=100000,
    sampling_cfg=dict(
        type='OneStepTransition',
    ),
)
rollout_cfg = dict(
    type='Rollout',
    num_procs=1,
)
eval_cfg = dict(
    type='Evaluation',
    num_procs=1,
    num=1,
    use_hidden_state=False,
    save_traj=False,
    save_video=True,
    log_every_step=False,
)
train_cfg = dict(
    on_policy=False,
    total_steps=5000,
    warm_steps=200,
    n_steps=1,
    n_updates=1,
    n_log=100,
    n_eval=-1,
    n_checkpoint=10000,
    exp_logger_cfg=dict(
        type='tensorboard',
    ),
)
agent_cfg = dict(
    type='SAC',
    batch_size=128,
    gamma=0.99,
    alpha=0.1,
    automatic_alpha_tuning=True,
    ignore_dones=False,
    update_coeff=dict(
        default=0.01,
        '(.*?)visual_nn(.*?)'=0.05,
    ),
    target_update_interval=2,
    actor_update_interval=2,
    alpha_optim_cfg=dict(
        type='Adam',
        lr=0.001,
        betas=(0.5, 0.999),
    ),
    shared_backbone=True,
    detach_actor_feature=True,
    actor_cfg=dict(
        type='ContinuousActor',
        head_cfg=dict(
            type='TanhGaussianHead',
            log_std_bound=[-10, 2],
        ),
        nn_cfg=dict(
            type='Visuomotor',
            visual_nn_cfg=dict(
                type='PointNet',
                feat_dim='pcd_all_channel',
                mlp_spec=[32, 64, 128],
                out_channels=50,
                feature_transform=[],
                ignore_first_ln=True,
            ),
            mlp_cfg=dict(
                type='LinearMLP',
                norm_cfg=None,
                mlp_spec=[50, 1024, 1024, 'action_shape * 2'],
                inactivated_output=True,
            ),
        ),
        optim_cfg=dict(
            type='Adam',
            lr=0.001,
            param_cfg=dict(
                '(.*?)visual_nn(.*?)'=None,
            ),
        ),
    ),
    critic_cfg=dict(
        type='ContinuousCritic',
        num_heads=2,
        nn_cfg=dict(
            type='Visuomotor',
            visual_nn_cfg=None,
            mlp_cfg=dict(
                type='LinearMLP',
                norm_cfg=None,
                mlp_spec=['50 + action_shape', 1024, 1024, 1],
                inactivated_output=True,
            ),
        ),
        optim_cfg=dict(
            type='Adam',
            lr=0.001,
        ),
    ),
    batch_sizeX=4,
)
env_cfg = dict(
    type='gym',
    env_name='reacher3d_easy-v0',
    obs_mode='pointcloud',
    stack_frame=1,
    horizon=1,
)
