_base_ = ["./base/cnn_base.py"]

agent_cfg = dict(
    batch_size=128,
    obs_aug=[
        dict(type="RandomCrop", size=[20, 20], padding=2, padding_mode="edge", req_keys=["rgb", "depth"], main_key="rgb"),
    ],
)

env_cfg = dict(env_name="reacher3d_easy-v0", obs_mode="rgbd", stack_frame=1, horizon=1)

train_cfg = dict(
    total_steps=5000,
    warm_steps=200,
    n_log=100,
    n_checkpoint=10000,
)
