# CNN variant of the synthetic sanity run (rgbd observations).
_base_ = ["../../../_base_/net_cnn_dmc.py"]

agent_cfg = dict(batch_size=128)

env_cfg = dict(env_name="reacher3d_easy-v0", obs_mode="rgbd", stack_frame=1, horizon=1)

train_cfg = dict(
    total_steps=5000,
    warm_steps=200,
    n_log=100,
    n_checkpoint=10000,
)
