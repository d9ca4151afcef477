"""On-device batched downsampling must satisfy pcd_base's invariants."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointcloud_rl_tpu.ops.sampling import seg_balanced_downsample, uniform_downsample


def _scene(B=3, n=2000, seed=0):
    rs = np.random.RandomState(seed)
    xyz = rs.rand(B, n, 3).astype(np.float32) + [0, 0, 0.4]
    xyz[:, -200:, 2] = 1e-4  # ground band
    seg = np.zeros((B, n, 2), bool)
    seg[:, :25, 0] = True       # tiny segment (25 < min_pts)
    seg[:, 25:1200, 1] = True   # large segment
    return jnp.asarray(xyz), jnp.asarray(seg)


def test_seg_balanced_downsample_invariants():
    xyz, seg = _scene()
    n_points, min_pts, fg = 600, 25, 400
    idx = seg_balanced_downsample(jax.random.PRNGKey(0), xyz, seg, n_points, min_pts=min_pts, fg_pts=fg)
    assert idx.shape == (3, n_points)
    gathered_z = np.take_along_axis(np.asarray(xyz[..., 2]), np.asarray(idx), axis=1)
    assert (gathered_z > 1e-3).all(), "ground points must never be selected"
    sel_seg = np.take_along_axis(np.asarray(seg[..., 0]), np.asarray(idx), axis=1)
    # tiny segment fully represented (25 unique points each)
    for b in range(3):
        assert np.unique(np.asarray(idx)[b][sel_seg[b]]).size == 25
    sel_big = np.take_along_axis(np.asarray(seg[..., 1]), np.asarray(idx), axis=1)
    assert (sel_big.sum(1) >= fg - 50).all(), "large segment dominates the foreground budget"
    # per-batch randomness differs
    assert not np.array_equal(np.asarray(idx)[0], np.asarray(idx)[1])


def test_seg_balanced_downsample_jits():
    xyz, seg = _scene(B=2, n=500)
    f = jax.jit(lambda k, x, s: seg_balanced_downsample(k, x, s, 128, min_pts=10, fg_pts=90))
    idx = f(jax.random.PRNGKey(1), xyz, seg)
    assert idx.shape == (2, 128)


def test_uniform_downsample_pads_by_tiling():
    rs = np.random.RandomState(1)
    xyz = np.zeros((2, 50, 3), np.float32)
    xyz[:, :10, 2] = 1.0  # only 10 valid points
    idx = uniform_downsample(jax.random.PRNGKey(0), jnp.asarray(xyz), 32)
    z = np.take_along_axis(xyz[..., 2], np.asarray(idx), axis=1)
    assert (z > 0).all()
    assert np.unique(np.asarray(idx)[0]).size <= 10  # tiled from the 10 valid
