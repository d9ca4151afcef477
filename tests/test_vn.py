"""VNPointNet (models/vn.py): SO(3)-equivariance contract + forward shapes.

The reference only registers VNPointNet in configs/mfrl/sac/maniskill/vn.py
(the implementation is absent from the snapshot); these tests pin the
defining property the architecture promises — a rotation-INVARIANT feature
readout — which no shape test alone would catch.
"""

import jax
import jax.numpy as jnp
import numpy as np

from pointcloud_rl_tpu.models.vn import VNLayerNorm, VNLinear, VNPointNet, knn_indices


def _rotation_matrix(rs):
    """Random proper rotation via QR of a Gaussian (det fixed to +1)."""
    q, _ = np.linalg.qr(rs.randn(3, 3))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    return jnp.asarray(q, jnp.float32)


def _cloud(rs, batch=2, n=64):
    xyz = jnp.asarray(rs.randn(batch, 3, n), jnp.float32)
    rgb = jnp.asarray(rs.randint(0, 255, (batch, 3, n)), jnp.uint8)
    return {"xyz": xyz, "rgb": rgb}


def test_vn_forward_shape_and_finite():
    rs = np.random.RandomState(0)
    obs = _cloud(rs)
    model = VNPointNet(feat_dim=6, mlp_spec=[16, 16, 32], out_channels=24, n_knn=4)
    params = model.init(jax.random.PRNGKey(0), obs)
    out = model.apply(params, obs)
    assert out.shape == (2, 24)
    assert np.isfinite(np.asarray(out)).all()


def test_vn_rotation_and_translation_invariance():
    rs = np.random.RandomState(1)
    obs = _cloud(rs)
    model = VNPointNet(feat_dim=6, mlp_spec=[16, 16, 32], out_channels=24, n_knn=4)
    params = model.init(jax.random.PRNGKey(0), obs)
    out = model.apply(params, obs)

    rot = _rotation_matrix(rs)
    shift = jnp.asarray(rs.randn(3, 1), jnp.float32)
    xyz_t = jnp.einsum("ij,bjn->bin", rot, obs["xyz"]) + shift[None]
    out_t = model.apply(params, {"xyz": xyz_t, "rgb": obs["rgb"]})
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_t), atol=2e-4)


def test_vn_not_constant():
    # Invariance must not come from a degenerate constant readout: two
    # different clouds give different features.
    rs = np.random.RandomState(2)
    a, b = _cloud(rs), _cloud(rs)
    model = VNPointNet(feat_dim=6, mlp_spec=[16, 16, 32], out_channels=24, n_knn=4)
    params = model.init(jax.random.PRNGKey(0), a)
    fa = np.asarray(model.apply(params, a))
    fb = np.asarray(model.apply(params, b))
    assert np.abs(fa - fb).max() > 1e-3


def test_vn_linear_equivariant():
    rs = np.random.RandomState(3)
    x = jnp.asarray(rs.randn(2, 5, 8, 3), jnp.float32)
    layer = VNLinear(12)
    params = layer.init(jax.random.PRNGKey(0), x)
    rot = _rotation_matrix(rs)
    lhs = layer.apply(params, x @ rot.T)
    rhs = layer.apply(params, x) @ rot.T
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-5)


def test_vn_layernorm_preserves_directions():
    rs = np.random.RandomState(4)
    x = jnp.asarray(rs.randn(2, 5, 8, 3), jnp.float32)
    layer = VNLayerNorm()
    params = layer.init(jax.random.PRNGKey(0), x)
    y = layer.apply(params, x)
    cos = np.sum(np.asarray(x) * np.asarray(y), -1) / (
        np.linalg.norm(np.asarray(x), axis=-1) * np.linalg.norm(np.asarray(y), axis=-1) + 1e-9
    )
    np.testing.assert_allclose(cos, np.ones_like(cos), atol=1e-4)


def test_knn_indices_exact():
    rs = np.random.RandomState(5)
    pts = rs.randn(1, 10, 3).astype(np.float32)
    idx = np.asarray(knn_indices(jnp.asarray(pts), 3))[0]
    d2 = ((pts[0][:, None] - pts[0][None]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    expect = np.argsort(d2, axis=-1)[:, :3]
    assert sorted(idx[4].tolist()) == sorted(expect[4].tolist())


def test_vn_registry_and_config_build():
    """The shipped vn.py config builds a runnable actor (params init + apply)."""
    from pointcloud_rl_tpu import Config
    from pointcloud_rl_tpu.models import (
        build_actor_critic,
        get_kwargs_from_shape,
        replace_placeholder_with_args,
    )

    cfg = Config.fromfile("configs/mfrl/sac/maniskill/vn.py")
    n = 96
    obs_shape = {"xyz": (3, n), "rgb": (3, n), "seg": (3, n), "state": (38,)}

    class _Box:
        low = -np.ones(8, np.float32)
        high = np.ones(8, np.float32)

        def is_bounded(self):
            return True

    env_info = dict(obs_shape=obs_shape, action_shape=8, action_space=_Box(), is_discrete=False)
    kwargs = get_kwargs_from_shape(obs_shape, 8)
    agent_cfg = replace_placeholder_with_args(dict(cfg["agent_cfg"]), **kwargs)
    model = build_actor_critic(agent_cfg["actor_cfg"], agent_cfg["critic_cfg"], env_info,
                               shared_backbone=agent_cfg.get("shared_backbone", False))
    assert type(model.visual).__name__ == "VNPointNet"
    rs = np.random.RandomState(6)
    obs = {
        "xyz": jnp.asarray(rs.randn(2, 3, n), jnp.float32),
        "rgb": jnp.asarray(rs.randint(0, 255, (2, 3, n)), jnp.uint8),
        "seg": jnp.asarray(rs.randint(0, 2, (2, 3, n)), jnp.uint8),
        "state": jnp.asarray(rs.randn(2, 38), jnp.float32),
    }
    from pointcloud_rl_tpu.models import init_actor_critic_params

    params, _ = init_actor_critic_params(model, jax.random.PRNGKey(0), obs, jnp.zeros((2, 8)))
    (act, _), _ = model.actor_apply(params, obs, mode="max-entropy", rng=jax.random.PRNGKey(1))
    assert act.shape == (2, 8) and np.isfinite(np.asarray(act)).all()
