"""SAC/DrQ update-step tests: shapes, metric contracts, EMA/interval gating,
optimizer masking (visual trained by critic only), and a learning sanity check."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointcloud_rl_tpu.algorithms import build_agent


class FakeMemory:
    """Uniform sampler over a fixed transition set (replay stand-in)."""

    def __init__(self, data, seed=0):
        self.data = data
        self.rs = np.random.RandomState(seed)
        self.n = len(data["actions"])

    def sample(self, batch_size):
        idx = self.rs.randint(0, self.n, batch_size)

        def take(x):
            if isinstance(x, dict):
                return {k: take(v) for k, v in x.items()}
            return x[idx]

        return {k: take(v) for k, v in self.data.items()}


class _Box:
    def __init__(self, low, high, shape):
        self.low = np.full(shape, low, np.float32)
        self.high = np.full(shape, high, np.float32)
        self.shape = shape

    def is_bounded(self):
        return True


def _state_env_params(obs_dim=3, action_dim=2):
    return dict(
        is_discrete=False,
        obs_shape=obs_dim,
        action_shape=action_dim,
        action_space=_Box(-1, 1, (action_dim,)),
    )


def _state_agent_cfg(obs_dim=3, action_dim=2, **overrides):
    cfg = dict(
        type="SAC",
        batch_size=32,
        gamma=0.9,
        alpha=0.2,
        automatic_alpha_tuning=True,
        update_coeff=0.01,
        target_update_interval=1,
        actor_update_interval=1,
        alpha_optim_cfg=dict(type="Adam", lr=3e-3),
        actor_cfg=dict(
            type="ContinuousActor",
            head_cfg=dict(type="TanhGaussianHead", log_std_bound=[-10, 2]),
            nn_cfg=dict(type="LinearMLP", norm_cfg=None, mlp_spec=[obs_dim, 64, action_dim * 2], inactivated_output=True),
            optim_cfg=dict(type="Adam", lr=3e-3),
        ),
        critic_cfg=dict(
            type="ContinuousCritic",
            num_heads=2,
            nn_cfg=dict(type="LinearMLP", norm_cfg=None, mlp_spec=[obs_dim + action_dim, 64, 1], inactivated_output=True),
            optim_cfg=dict(type="Adam", lr=3e-3),
        ),
        env_params=_state_env_params(obs_dim, action_dim),
        seed=3,
    )
    cfg.update(overrides)
    return cfg


def _state_data(n=512, obs_dim=3, action_dim=2, seed=0):
    rs = np.random.RandomState(seed)
    obs = rs.randn(n, obs_dim).astype(np.float32)
    actions = np.clip(rs.randn(n, action_dim), -1, 1).astype(np.float32)
    # Reward: 1-step bandit, r = -||a - tanh(obs[:, :action_dim])||^2, episode ends.
    target = np.tanh(obs[:, :action_dim])
    rewards = -np.sum((actions - target) ** 2, -1, keepdims=True).astype(np.float32)
    next_obs = rs.randn(n, obs_dim).astype(np.float32)
    dones = np.ones((n, 1), bool)
    return dict(obs=obs, next_obs=next_obs, actions=actions, rewards=rewards, dones=dones,
                episode_dones=dones.copy())


def test_sac_update_metrics_and_gating():
    agent = build_agent(_state_agent_cfg(actor_update_interval=2, target_update_interval=2))
    mem = FakeMemory(_state_data())
    m0 = agent.update_parameters(mem, 0)  # updates counter starts at 0 -> actor updated
    assert "sac/critic_loss" in m0 and "sac/actor_loss" in m0 and "sac/alpha" in m0
    m1 = agent.update_parameters(mem, 1)  # counter 1 -> actor skipped
    assert "sac/actor_loss" not in m1
    m2 = agent.update_parameters(mem, 2)
    assert "sac/actor_loss" in m2
    assert m2["sac/grad_steps"] == 1
    assert np.isfinite(m2["sac/critic_loss"])


def test_sac_target_ema_moves_toward_live():
    agent = build_agent(_state_agent_cfg(update_coeff=0.5))
    mem = FakeMemory(_state_data())
    t0 = jax.device_get(agent.train_state.target_params)
    for i in range(3):
        agent.update_parameters(mem, i)
    t1 = jax.device_get(agent.train_state.target_params)
    p1 = jax.device_get(agent.train_state.params)
    # target moved from its init and toward live critic
    d_moved = sum(float(np.abs(a - b).sum()) for a, b in zip(jax.tree_util.tree_leaves(t0), jax.tree_util.tree_leaves(t1)))
    assert d_moved > 0
    d_gap = sum(
        float(np.abs(a - b).sum())
        for a, b in zip(jax.tree_util.tree_leaves(t1), jax.tree_util.tree_leaves(p1["critic"]))
    )
    d_gap0 = sum(
        float(np.abs(a - b).sum())
        for a, b in zip(jax.tree_util.tree_leaves(t0), jax.tree_util.tree_leaves(p1["critic"]))
    )
    assert d_gap < d_gap0


def test_sac_learns_bandit():
    """On a 1-step bandit with known optimum, Q and policy must improve."""
    agent = build_agent(_state_agent_cfg())
    data = _state_data(n=2048, seed=1)
    mem = FakeMemory(data, seed=2)
    for i in range(300):
        m = agent.update_parameters(mem, i)
    obs = data["obs"][:256]
    actions = agent.forward(obs, mode="eval")
    target = np.tanh(obs[:, :2])
    mse = float(np.mean((actions - target) ** 2))
    assert mse < 0.05, f"SAC failed to learn the bandit: action mse {mse}"


def _pcd_env_params(N=32, action_dim=2):
    return dict(
        is_discrete=False,
        obs_shape={"xyz": (3, N), "rgb": (3, N), "state": (4,)},
        action_shape=action_dim,
        action_space=_Box(-1, 1, (action_dim,)),
    )


def _pcd_agent_cfg(N=32, action_dim=2, agent_dim=4, aug=None, **overrides):
    cfg = dict(
        type="DrQ",
        num_aug=2,
        obs_aug=aug or dict(type="RandomJitterPoints", main_key="xyz", req_keys=["xyz"], jitter_range=[-0.01, 0.01]),
        batch_size=16,
        gamma=0.95,
        alpha=0.1,
        shared_backbone=True,
        detach_actor_feature=True,
        update_coeff={"default": 0.01, "(.*?)visual_nn(.*?)": 0.05},
        actor_cfg=dict(
            type="ContinuousActor",
            head_cfg=dict(type="TanhGaussianHead", log_std_bound=[-10, 2]),
            nn_cfg=dict(
                type="Visuomotor",
                visual_nn_cfg=dict(type="PointNet", feat_dim=6, mlp_spec=[16, 32], out_channels=24,
                                   feature_transform=[], ignore_first_ln=True),
                mlp_cfg=dict(type="LinearMLP", norm_cfg=None, mlp_spec=[24 + agent_dim, 32, action_dim * 2],
                             inactivated_output=True),
            ),
            optim_cfg=dict(type="Adam", lr=1e-3, param_cfg={"(.*?)visual_nn(.*?)": None}),
        ),
        critic_cfg=dict(
            type="ContinuousCritic",
            num_heads=2,
            nn_cfg=dict(
                type="Visuomotor",
                visual_nn_cfg=None,
                mlp_cfg=dict(type="LinearMLP", norm_cfg=None,
                             mlp_spec=[24 + agent_dim + action_dim, 32, 1], inactivated_output=True),
            ),
            optim_cfg=dict(type="Adam", lr=1e-3),
        ),
        env_params=_pcd_env_params(N, action_dim),
        seed=0,
    )
    cfg.update(overrides)
    return cfg


def _pcd_data(n=64, N=32, action_dim=2, seed=0):
    rs = np.random.RandomState(seed)
    def obs(m):
        return {
            "xyz": rs.randn(m, 3, N).astype(np.float32),
            "rgb": rs.randint(0, 255, (m, 3, N), dtype=np.uint8),
            "state": rs.randn(m, 4).astype(np.float32),
        }
    return dict(
        obs=obs(n),
        next_obs=obs(n),
        actions=np.clip(rs.randn(n, action_dim), -1, 1).astype(np.float32),
        rewards=rs.randn(n, 1).astype(np.float32),
        dones=np.zeros((n, 1), bool),
        episode_dones=np.zeros((n, 1), bool),
    )


def test_drq_pointcloud_update_and_visual_ownership():
    agent = build_agent(_pcd_agent_cfg())
    mem = FakeMemory(_pcd_data())
    v0 = jax.device_get(agent.train_state.params["visual"])
    a0 = jax.device_get(agent.train_state.params["actor"])
    m = agent.update_parameters(mem, 0)
    assert "drq/critic_loss" in m and "drq/actor_loss" in m
    v1 = jax.device_get(agent.train_state.params["visual"])
    a1 = jax.device_get(agent.train_state.params["actor"])
    # visual subtree is trained (by the critic optimizer)
    dv = sum(float(np.abs(x - y).sum()) for x, y in zip(jax.tree_util.tree_leaves(v0), jax.tree_util.tree_leaves(v1)))
    da = sum(float(np.abs(x - y).sum()) for x, y in zip(jax.tree_util.tree_leaves(a0), jax.tree_util.tree_leaves(a1)))
    assert dv > 0, "shared visual backbone must be updated by the critic optimizer"
    assert da > 0, "actor mlp/head must be updated by the actor optimizer"
    # target params hold only the critic subtree (shared target backbone)
    assert set(jax.device_get(agent.train_state.target_params).keys()) == {"critic"}

    # inference works on pointcloud obs
    obs = _pcd_data(n=5)["obs"]
    act = agent.forward(obs, mode="eval")
    assert act.shape == (5, 2) and np.all(np.abs(act) <= 1.0)


def test_drq_svea_mode():
    agent = build_agent(_pcd_agent_cfg(num_aug=1, svea=True))
    mem = FakeMemory(_pcd_data())
    m = agent.update_parameters(mem, 0)
    assert np.isfinite(m["drq/critic_loss"])


def test_sac_discrete():
    cfg = dict(
        type="SAC",
        batch_size=16,
        env_params=dict(is_discrete=True, obs_shape=6, action_shape=4, action_space=None),
        actor_cfg=dict(
            type="DiscreteActor",
            head_cfg=dict(type="DiscreteBaseHead"),
            nn_cfg=dict(type="LinearMLP", norm_cfg=None, mlp_spec=[6, 32, 4], inactivated_output=True),
            optim_cfg=dict(type="Adam", lr=1e-3),
        ),
        critic_cfg=dict(
            type="DiscreteCritic",
            num_heads=2,
            nn_cfg=dict(type="LinearMLP", norm_cfg=None, mlp_spec=[6, 32, 4], inactivated_output=True),
            optim_cfg=dict(type="Adam", lr=1e-3),
        ),
        seed=0,
    )
    agent = build_agent(cfg)
    rs = np.random.RandomState(0)
    n = 128
    data = dict(
        obs=rs.randn(n, 6).astype(np.float32),
        next_obs=rs.randn(n, 6).astype(np.float32),
        actions=rs.randint(0, 4, (n, 1)),
        rewards=rs.randn(n, 1).astype(np.float32),
        dones=np.zeros((n, 1), bool),
        episode_dones=np.zeros((n, 1), bool),
    )
    m = agent.update_parameters(FakeMemory(data), 0)
    assert np.isfinite(m["sac/critic_loss"])
    assert "sac/q_match_rate" in m
    a = agent.forward(data["obs"][:3], mode="eval")
    assert a.shape == (3, 1) and a.dtype in (np.int32, np.int64)


def test_ddpg_learns_bandit():
    cfg = _state_agent_cfg()
    cfg["type"] = "DDPG"
    cfg.pop("alpha"); cfg.pop("automatic_alpha_tuning")
    cfg["actor_cfg"]["head_cfg"] = dict(type="TanhHead")
    cfg["actor_cfg"]["nn_cfg"]["mlp_spec"] = [3, 64, 2]
    agent = build_agent(cfg)
    data = _state_data(n=2048, seed=1)
    mem = FakeMemory(data, seed=2)
    m = agent.update_parameters(mem, 0)
    assert "ddpg/critic_loss" in m and np.isfinite(m["ddpg/critic_loss"])
    for i in range(1, 300):
        agent.update_parameters(mem, i)
    obs = data["obs"][:256]
    actions = agent.forward(obs, mode="eval")
    target = np.tanh(obs[:, :2])
    mse = float(np.mean((actions - target) ** 2))
    assert mse < 0.05, f"DDPG failed to learn the bandit: action mse {mse}"
    # exploration noise perturbs actions
    a_explore = agent.forward(obs, mode="explore")
    assert not np.allclose(actions, a_explore)


def test_bf16_update_tracks_f32():
    """Mixed precision (bf16 matmuls, f32 LN/params/losses): per-update
    numerics drift vs the f32 path stays bounded and params remain f32."""
    import jax

    from __graft_entry__ import _agent_cfg, _example_batch
    from pointcloud_rl_tpu.env import DeviceReplayMemory

    def run(bf16):
        cfg = _agent_cfg(96, 4, width=16, out=16)
        cfg["bf16"] = bf16
        agent = build_agent(cfg)
        mem = DeviceReplayMemory(capacity=64, seed=1)
        mem.push_batch(_example_batch(64, 96, 4, seed=2))
        metrics = [agent.update_parameters(mem, i) for i in range(3)]
        return agent, metrics

    agent_f32, m32 = run(False)
    agent_b16, m16 = run(True)
    for a, b in zip(m32, m16):
        assert abs(a["sac/critic_loss"] - b["sac/critic_loss"]) < 5e-2 * (1 + abs(a["sac/critic_loss"]))
    # params stay f32 under mixed precision, and the divergence stays within
    # the Adam step envelope: |update| <= ~lr per step, so even where bf16
    # rounding flips a gradient sign the two runs differ by at most
    # 2 * lr * n_updates per element (slack 2x for bias correction).
    leaves16 = jax.tree_util.tree_leaves(jax.device_get(agent_b16.train_state.params))
    leaves32 = jax.tree_util.tree_leaves(jax.device_get(agent_f32.train_state.params))
    assert all(l.dtype == np.float32 for l in leaves16)
    lr, n_updates = 1e-3, 3
    bound = 2 * 2 * lr * n_updates
    worst = max(float(np.max(np.abs(a - b))) for a, b in zip(leaves32, leaves16))
    assert worst < bound, f"bf16 drift outside the Adam step envelope: {worst} >= {bound}"
