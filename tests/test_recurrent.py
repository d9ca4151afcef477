"""Recurrent SAC end-to-end: GRU-backed actor-critic updating from T-step
windows and acting with threaded states."""

import jax
import numpy as np
import pytest

from pointcloud_rl_tpu.algorithms import build_agent
from pointcloud_rl_tpu.env import ReplayMemory


def _recurrent_cfg(obs_dim=5, action_dim=2):
    return dict(
        type="SAC",
        batch_size=8,
        gamma=0.9,
        shared_backbone=True,
        actor_cfg=dict(
            type="ContinuousActor",
            head_cfg=dict(type="TanhGaussianHead", log_std_bound=[-10, 2]),
            nn_cfg=dict(
                type="Visuomotor",
                visual_nn_cfg=dict(type="LinearMLP", norm_cfg=None, mlp_spec=[obs_dim, 16], inactivated_output=False),
                rnn_cfg=dict(type="GRU", hidden_size=12),
                mlp_cfg=dict(type="LinearMLP", norm_cfg=None, mlp_spec=[12, 16, action_dim * 2], inactivated_output=True),
            ),
            optim_cfg=dict(type="Adam", lr=1e-3, param_cfg={"(.*?)visual_nn(.*?)": None}),
        ),
        critic_cfg=dict(
            type="ContinuousCritic",
            num_heads=2,
            nn_cfg=dict(
                type="Visuomotor",
                visual_nn_cfg=None,
                mlp_cfg=dict(type="LinearMLP", norm_cfg=None, mlp_spec=[12 + action_dim, 16, 1], inactivated_output=True),
            ),
            optim_cfg=dict(type="Adam", lr=1e-3),
        ),
        env_params=dict(
            is_discrete=False,
            obs_shape=obs_dim,
            action_shape=action_dim,
            action_space=None,
        ),
        seed=0,
    )


def _fill_replay(obs_dim=5, action_dim=2, episodes=6, length=7):
    mem = ReplayMemory(capacity=256, sampling_cfg=dict(type="TStepTransition", horizon=4, seed=0))
    rs = np.random.RandomState(0)
    for e in range(episodes):
        for t in range(length):
            mem.push_batch(dict(
                obs=rs.randn(1, obs_dim).astype(np.float32),
                next_obs=rs.randn(1, obs_dim).astype(np.float32),
                actions=np.clip(rs.randn(1, action_dim), -1, 1).astype(np.float32),
                rewards=rs.randn(1, 1).astype(np.float32),
                dones=np.array([[t == length - 1]]),
                episode_dones=np.array([[t == length - 1]]),
                worker_indices=np.zeros((1, 1), np.int32),
            ))
    return mem


def test_recurrent_sac_update_and_act():
    agent = build_agent(_recurrent_cfg())
    assert agent.model.is_recurrent
    assert "rnn" in agent.train_state.params
    # shared target backbone: target holds only the critic subtree
    assert set(jax.device_get(agent.train_state.target_params)) == {"critic"}

    mem = _fill_replay()
    rnn0 = jax.device_get(agent.train_state.params["rnn"])
    m = agent.update_parameters(mem, 0)
    assert np.isfinite(m["sac/critic_loss"])
    rnn1 = jax.device_get(agent.train_state.params["rnn"])
    moved = sum(float(np.abs(a - b).sum()) for a, b in
                zip(jax.tree_util.tree_leaves(rnn0), jax.tree_util.tree_leaves(rnn1)))
    assert moved > 0, "shared rnn must be trained by the critic optimizer"

    # multiple updates stay finite
    for i in range(1, 4):
        m = agent.update_parameters(mem, i)
    assert np.isfinite(m["sac/critic_loss"])

    # act with threaded rnn state; state persists and resets on done
    obs = np.random.RandomState(1).randn(3, 5).astype(np.float32)
    a1 = agent.forward(obs, mode="eval")
    assert a1.shape == (3, 2)
    s_before = np.asarray(agent._rnn_states).copy()
    a2 = agent.forward(obs, mode="eval")
    s_after = np.asarray(agent._rnn_states)
    assert not np.allclose(s_before, s_after), "rnn state must evolve across steps"
    assert not np.allclose(a1, a2), "same obs through evolving state changes the action"
    agent.reset_rnn_states(np.array([[1], [0], [0]]))
    assert np.abs(np.asarray(agent._rnn_states)[0]).sum() == 0
    assert np.abs(np.asarray(agent._rnn_states)[1]).sum() > 0
