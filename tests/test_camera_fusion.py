"""Camera fusion: unprojection round-trips and multi-camera consistency."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointcloud_rl_tpu.ops.camera import depth_to_camera_xyz, fuse_camera_pointclouds, transform_points


def _look_down_pose(height):
    """Camera at (0, 0, height) looking down -z ... pointing straight down."""
    pose = np.eye(4, dtype=np.float32)
    pose[2, 3] = height
    # camera z-axis into the scene (down): rotate 180 deg about x
    pose[1, 1] = -1
    pose[2, 2] = -1
    return pose


def test_unprojection_geometry():
    H = W = 8
    f = 10.0
    K = np.array([[f, 0, (W - 1) / 2], [0, f, (H - 1) / 2], [0, 0, 1]], np.float32)
    depth = np.full((1, H, W), 2.0, np.float32)
    xyz = np.asarray(depth_to_camera_xyz(jnp.asarray(depth), jnp.asarray(K)[None]))
    assert xyz.shape == (1, H * W, 3)
    np.testing.assert_allclose(xyz[0, :, 2], 2.0, atol=1e-6)  # z = depth
    # center pixel ray passes near the optical axis
    center = xyz[0].reshape(H, W, 3)[H // 2, W // 2]
    assert abs(center[0]) < 0.5 and abs(center[1]) < 0.5


def test_two_cameras_fuse_to_common_world_plane():
    """Two downward cameras at different heights over the z=0 plane must
    both produce world points on that plane."""
    H = W = 6
    f = 8.0
    K = np.array([[f, 0, (W - 1) / 2], [0, f, (H - 1) / 2], [0, 0, 1]], np.float32)
    h1, h2 = 2.0, 3.0
    depths = np.stack([np.full((H, W), h1), np.full((H, W), h2)]).astype(np.float32)[None]
    rgbs = np.zeros((1, 2, H, W, 3), np.uint8)
    poses = np.stack([_look_down_pose(h1), _look_down_pose(h2)])[None]
    xyz, rgb, _ = fuse_camera_pointclouds(
        jnp.asarray(depths), jnp.asarray(rgbs), jnp.asarray(K)[None].repeat(2, 0), jnp.asarray(poses)
    )
    assert xyz.shape == (1, 2 * H * W, 3)
    np.testing.assert_allclose(np.asarray(xyz)[0, :, 2], 0.0, atol=1e-5)


def test_transform_points_roundtrip():
    rs = np.random.RandomState(0)
    pts = rs.randn(2, 10, 3).astype(np.float32)
    T = np.eye(4, dtype=np.float32)[None].repeat(2, 0)
    q = np.linalg.qr(rs.randn(3, 3))[0].astype(np.float32)
    T[:, :3, :3] = q
    T[:, :3, 3] = [1, 2, 3]
    out = np.asarray(transform_points(jnp.asarray(pts), jnp.asarray(T)))
    inv = np.linalg.inv(T)
    back = np.asarray(transform_points(jnp.asarray(out), jnp.asarray(inv)))
    np.testing.assert_allclose(back, pts, atol=1e-4)
