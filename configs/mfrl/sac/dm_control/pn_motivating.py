# Fast end-to-end sanity run on the synthetic one-step reaching task.
_base_ = ["../../../_base_/net_pn_dmc.py"]

agent_cfg = dict(
    batch_size=128,
    actor_cfg=dict(
        nn_cfg=dict(
            visual_nn_cfg=dict(mlp_spec=[32, 64, 128]),
        ),
    ),
)

env_cfg = dict(env_name="reacher3d_easy-v0", stack_frame=1, horizon=1)

# single worker + 1:1 stepping: this config is the fast CI/debug drive —
# the multi-worker pipelined defaults only pay off on real accelerators
rollout_cfg = dict(num_procs=1)

train_cfg = dict(
    total_steps=5000,
    warm_steps=200,
    n_steps=1,
    n_updates=1,
    n_log=100,
    n_checkpoint=10000,
)
