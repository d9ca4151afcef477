_base_ = ["./net_pn_maniskill.py"]

# CNN (DMCEncoder) variant for ManiSkill RGB observations.

agent_cfg = dict(
    actor_cfg=dict(
        nn_cfg=dict(
            visual_nn_cfg=dict(
                _delete_=True,
                type="DMCEncoder",
                in_channels="image_channels",
                out_channels=128,
                image_size="image_size",
                conv_init_cfg=dict(type="delta_orthogonal_init", gain=1.414),
            ),
        ),
    ),
)

env_cfg = dict(obs_mode="rgb", camera_size=125)
