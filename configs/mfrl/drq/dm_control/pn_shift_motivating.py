_base_ = ["./pn_shift.py"]

agent_cfg = dict(batch_size=128)

env_cfg = dict(env_name="reacher3d_easy-v0", stack_frame=1, horizon=1)

train_cfg = dict(
    total_steps=5000,
    warm_steps=200,
    n_log=100,
    n_checkpoint=10000,
)
