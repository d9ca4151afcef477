"""Native C++ kernel tests: semantics match the numpy implementations."""

import numpy as np
import pytest

from pointcloud_rl_tpu import native

pytestmark = pytest.mark.skipif(not native.available(), reason="native toolchain unavailable")


def test_unproject_matches_numpy():
    rs = np.random.RandomState(0)
    depth = rs.rand(32, 24).astype(np.float32) * 5
    inv_k = np.linalg.inv(np.array([[30.0, 0, 11.5], [0, 30.0, 15.5], [0, 0, 1]]))
    rot = np.linalg.qr(rs.randn(3, 3))[0]
    out = native.unproject_depth(depth, inv_k, rot, z_offset=1.5)

    v, u = np.indices(depth.shape)
    uv1 = np.stack([u + 0.5, v + 0.5, np.ones_like(depth)], axis=-1)
    ref = (uv1 @ inv_k.T * depth[..., None]) @ rot.T
    ref[..., 2] += 1.5
    np.testing.assert_allclose(out, ref.astype(np.float32), rtol=1e-5, atol=1e-5)


def test_ground_body_split_shapes_and_semantics():
    rs = np.random.RandomState(1)
    n = 500
    xyz = rs.rand(n, 3).astype(np.float32)
    xyz[:100, 2] = 0.001  # ground band
    xyz[100:, 2] += 0.5
    rgb = rs.randint(0, 255, (n, 3), dtype=np.uint8)
    out_xyz, out_rgb, n_valid = native.ground_body_split_sample(
        xyz, rgb, None, ground_eps=0.01, n_body=300, n_ground=100, seed=42
    )
    assert n_valid == n
    assert out_xyz.shape == (400, 3) and out_rgb.shape == (400, 3)
    # first 300 are body (z above ground band), last 100 ground
    assert (out_xyz[:300, 2] > 0.011).all()
    assert (out_xyz[300:, 2] <= 0.012).all()
    # determinism per seed
    out2, _, _ = native.ground_body_split_sample(xyz, rgb, None, 0.01, 300, 100, seed=42)
    np.testing.assert_array_equal(out_xyz, out2)
    out3, _, _ = native.ground_body_split_sample(xyz, rgb, None, 0.01, 300, 100, seed=43)
    assert not np.array_equal(out_xyz, out3)


def test_ground_body_empty_side_zero_fill():
    rs = np.random.RandomState(2)
    xyz = (rs.rand(50, 3) + 0.5).astype(np.float32)  # no ground points
    rgb = rs.randint(0, 255, (50, 3), dtype=np.uint8)
    out_xyz, out_rgb, _ = native.ground_body_split_sample(xyz, rgb, None, 1e-3, 30, 10, seed=0, fix_base_z=0.0)
    assert (out_xyz[30:] == 0).all() and (out_rgb[30:] == 0).all()
    assert (np.abs(out_xyz[:30]).sum(axis=1) > 0).all()


def test_seg_balanced_indices_semantics():
    rs = np.random.RandomState(3)
    n = 3000
    xyz = rs.rand(n, 3).astype(np.float32) + [0, 0, 0.5]
    xyz[-50:, 2] = 1e-4  # ground points must never be selected
    seg = np.zeros((n, 2), np.uint8)
    seg[:30, 0] = 1       # tiny segment: all 30 kept (min_pts=50 > 30)
    seg[30:1500, 1] = 1   # large segment
    idx = native.seg_balanced_sample_indices(xyz, seg, n_points=1200, min_pts=50, fg_pts=800, seed=7)
    assert idx.shape == (1200,)
    assert (xyz[idx][:, 2] > 1e-3).all()
    sel = np.zeros(n, bool)
    sel[idx] = True
    assert seg[idx][:, 0].sum() >= 30  # tiny segment fully present (may tile)
    assert np.unique(idx[seg[idx][:, 0] == 1]).size == 30
    assert seg[idx][:, 1].sum() >= 700  # large segment dominates foreground
