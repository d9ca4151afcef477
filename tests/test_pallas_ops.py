"""Fused-PointNet-body tests (the XLA+winner-backward path on the CPU test
mesh; the Pallas forward compiles only on real TPU): forward must match a
plain autodiff reference bit-for-bit and the winner-gather backward must
match autodiff gradients (ties excepted — winner routing is torch ``max``
semantics, reference pointnet.py:151)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointcloud_rl_tpu.ops.pointnet_fused import (
    _body_rows,
    fused_pointnet_body,
)


def _reference_body(x, params):
    """Plain autodiff body + max-pool (ground truth)."""
    B, N, C = x.shape
    return _body_rows(x.reshape(B * N, C), params, None).reshape(B, N, -1).max(axis=-2)


def _params(rng, c_in=9, dims=(32, 64, 128)):
    def w(key, shape):
        return jnp.asarray(rng.randn(*shape) * 0.1, jnp.float32)

    d0, d1, d2 = dims
    return (
        w(None, (c_in, d0)), jnp.zeros(d0),
        w(None, (d0, d1)), jnp.asarray(rng.randn(d1) * 0.01, jnp.float32),
        jnp.ones(d1), jnp.zeros(d1),
        w(None, (d1, d2)), jnp.asarray(rng.randn(d2) * 0.01, jnp.float32),
        jnp.ones(d2), jnp.zeros(d2),
    )


def test_fused_matches_reference_forward():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(4, 300, 9), jnp.float32)  # 300 not divisible by tile
    params = _params(rng)
    out_fused = fused_pointnet_body(x, params, 128)
    out_ref = _reference_body(x, params)
    assert out_fused.shape == (4, 128)
    np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_ref), rtol=1e-5, atol=1e-5)


def test_fused_backward_matches_reference():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 200, 9), jnp.float32)
    params = _params(rng)

    def loss_fused(p):
        return (fused_pointnet_body(x, p, 128) ** 2).sum()

    def loss_ref(p):
        return (_reference_body(x, p) ** 2).sum()

    g_fused = jax.grad(loss_fused)(params)
    g_ref = jax.grad(loss_ref)(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_fused), jax.tree_util.tree_leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_fused_pointnet_module():
    from pointcloud_rl_tpu.models import build_all

    obs = {
        "xyz": jnp.asarray(np.random.RandomState(0).randn(3, 3, 100), jnp.float32),
        "rgb": jnp.zeros((3, 3, 100), jnp.uint8),
        "pos_encoding": jnp.zeros((3, 3, 100), jnp.uint8),
    }
    pn = build_all(dict(type="PointNet", feat_dim=9, mlp_spec=[16, 32, 64], out_channels=20,
                        feature_transform=[], ignore_first_ln=True, fused=True))
    params = pn.init({"params": jax.random.PRNGKey(0)}, obs)
    out = pn.apply(params, obs)
    assert out.shape == (3, 20)
    # canonical param tree: the fused kernel reads the unfused conv MLP's
    # params (weight tying), so no fused_* params exist
    assert "conv" in params["params"] and "fused_w1" not in params["params"]
    # permutation invariance still holds
    perm = np.random.RandomState(2).permutation(100)
    obs_p = {k: v[..., perm] for k, v in obs.items()}
    np.testing.assert_allclose(np.asarray(pn.apply(params, obs_p)), np.asarray(out), atol=1e-5)


def test_fused_flag_checkpoint_portable():
    """fused=True/False produce IDENTICAL param trees (same init values),
    so checkpoints are portable across the kernel flag — flipping it never
    invalidates a training run (round-3 resume regression)."""
    from pointcloud_rl_tpu.models.pointnet import PointNet

    kw = dict(feat_dim=6, mlp_spec=(16, 32, 64), out_channels=24,
              feature_transform=(), ignore_first_ln=True)
    x = np.random.RandomState(0).randn(2, 6, 64).astype(np.float32)
    k = jax.random.PRNGKey(3)
    pu = PointNet(fused=False, **kw).init(k, x)
    pf = PointNet(fused=True, **kw).init(k, x)
    assert jax.tree_util.tree_structure(pu) == jax.tree_util.tree_structure(pf)
    for a, b in zip(jax.tree_util.tree_leaves(pu), jax.tree_util.tree_leaves(pf)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # the fused apply runs on the unfused params and matches the XLA body
    ou = PointNet(fused=False, **kw).apply(pu, x)
    of = PointNet(fused=True, **kw).apply(pu, x)
    np.testing.assert_allclose(np.asarray(ou), np.asarray(of), atol=5e-4)
    # gradients flow through the tied params in the fused path
    g = jax.grad(lambda p: (PointNet(fused=True, **kw).apply(p, x) ** 2).sum())(pu)
    assert all(float(np.abs(np.asarray(l)).sum()) > 0 for l in jax.tree_util.tree_leaves(g))
