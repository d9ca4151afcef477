# DMCEncoder with LayerNorm after each conv.
_base_ = ["../../../_base_/net_cnn_maniskill.py"]

agent_cfg = dict(
    actor_cfg=dict(
        nn_cfg=dict(
            visual_nn_cfg=dict(norm_cfg=dict(type="LN2d")),
        ),
    ),
)

env_cfg = dict(env_name="PushChair_3001-v0")
