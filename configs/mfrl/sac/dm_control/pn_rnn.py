# Recurrent point-cloud SAC: a GRU core between the PointNet feature and
# the policy/critic heads, trained on T-step windows. (The reference
# exposes this branch but ships no working RNN module.)
_base_ = ["../../../_base_/net_pn_dmc.py"]

agent_cfg = dict(
    batch_size=64,
    actor_cfg=dict(
        nn_cfg=dict(
            rnn_cfg=dict(type="GRU", hidden_size=128),
            mlp_cfg=dict(mlp_spec=[128, 1024, 1024, "action_shape * 2"]),
        ),
    ),
    critic_cfg=dict(
        nn_cfg=dict(
            mlp_cfg=dict(mlp_spec=["128 + action_shape", 1024, 1024, 1]),
        ),
    ),
)

env_cfg = dict(env_name="dmc_cheetah_run-v0")

# Recurrent training samples T-step windows, which needs the host replay's
# episode tracking (the HBM replay samples iid transitions only).
replay_cfg = dict(
    type="ReplayMemory",
    sampling_cfg=dict(_delete_=True, type="TStepTransition", horizon=8),
)
