"""Gather-based sparse conv tests: site dedup, dense equivalence, module path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointcloud_rl_tpu.ops.sparse_conv import downsample_sites, sparse_conv_layer
from pointcloud_rl_tpu.ops.voxelize import voxelize_sparse


def test_downsample_sites_dedup():
    coords = jnp.asarray([[[0, 0, 0], [1, 1, 1], [2, 2, 2], [3, 3, 3], [0, 0, 0]]], jnp.int32)
    valid = jnp.asarray([[True, True, True, True, False]])
    out, ov = downsample_sites(coords, valid, stride=2, capacity=5)
    # //2 -> {(0,0,0), (1,1,1)}: two unique sites
    assert int(ov.sum()) == 2
    got = {tuple(np.asarray(out[0, i])) for i in range(2)}
    assert got == {(0, 0, 0), (1, 1, 1)}


def test_sparse_conv_matches_dense_conv():
    """With all sites occupied on a small grid, the gather-based sparse conv
    must agree with a dense strided conv using the same weights."""
    rs = np.random.RandomState(0)
    G, C_in, C_out, K, S = 4, 3, 5, 4, 2
    # fully occupied G^3 grid
    coords = np.stack(np.meshgrid(*[np.arange(G)] * 3, indexing="ij"), -1).reshape(-1, 3)
    M = len(coords)
    feat = rs.randn(1, M, C_in).astype(np.float32)
    valid = np.ones((1, M), bool)
    weights = rs.randn(K**3, C_in, C_out).astype(np.float32) * 0.1
    bias = rs.randn(C_out).astype(np.float32) * 0.1

    out_feat, out_coords, out_valid = sparse_conv_layer(
        jnp.asarray(feat), jnp.asarray(coords)[None], jnp.asarray(valid), jnp.asarray(weights), jnp.asarray(bias),
        stride=S, kernel_size=K,
    )
    n_out = int(out_valid.sum())
    assert n_out == (G // S) ** 3

    # dense reference: scatter into grid, manual window sum per output site
    grid = np.zeros((G, G, G, C_in), np.float32)
    for i, c in enumerate(coords):
        grid[tuple(c)] = feat[0, i]
    offs = np.stack(np.meshgrid(*[np.arange(-(K // 2 - 1), K // 2 + 1)] * 3, indexing="ij"), -1).reshape(-1, 3)
    for i in range(n_out):
        oc = np.asarray(out_coords[0, i])
        acc = bias.copy()
        for k, off in enumerate(offs):
            q = oc * S + off
            if (0 <= q).all() and (q < G).all():
                acc = acc + grid[tuple(q)] @ weights[k]
        # find matching row
        got = np.asarray(out_feat[0, i])
        np.testing.assert_allclose(got, acc, rtol=1e-4, atol=1e-4)


def test_voxel_cnn_sparse_impl():
    from pointcloud_rl_tpu.models import build_all

    obs = {
        "xyz": jnp.asarray(np.random.RandomState(0).rand(2, 3, 96), jnp.float32),
        "rgb": jnp.zeros((2, 3, 96), jnp.uint8),
        "seg": jnp.zeros((2, 2, 96), jnp.float32),
    }
    net = build_all(dict(type="SparseCNN", in_channels=8, out_channels=24, voxel_size=0.1,
                         mlp_spec=[16, 24, 32], impl="sparse"))
    params = net.init({"params": jax.random.PRNGKey(0)}, obs)
    out = net.apply(params, obs)
    assert out.shape == (2, 24)
    assert np.isfinite(np.asarray(out)).all()
    # permutation invariance (voxelization + max-pool are order-free)
    perm = np.random.RandomState(1).permutation(96)
    obs_p = {k: v[..., perm] for k, v in obs.items()}
    np.testing.assert_allclose(np.asarray(net.apply(params, obs_p)), np.asarray(out), rtol=1e-4, atol=1e-4)
