_base_ = ["./base/cnn_base.py"]

agent_cfg = dict(
    actor_cfg=dict(
        nn_cfg=dict(
            visual_nn_cfg=dict(norm_cfg=dict(type="LN2d")),
        ),
    ),
    obs_aug=[
        dict(type="RandomCrop", size=[50, 125], padding=4, padding_mode="edge",
             req_keys=["rgb", "depth", "seg"], main_key="rgb"),
    ],
)

env_cfg = dict(env_name="PushChair_3001-v0")
