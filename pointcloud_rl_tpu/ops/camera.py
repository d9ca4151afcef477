"""Batched multi-camera depth -> fused world-frame point clouds.

Parity target: the reference's ManiSkill2 server-render path
(``maniskill_wrappers.py:28-139`` ManiSkillBatchWrapper): per-camera depth
images are unprojected with the camera intrinsics, transformed into the
world frame with the camera-to-world matrices (one einsum over the batch),
concatenated across cameras, and downsampled on device.  Everything here is
jittable with static shapes; combine with ``ops.sampling`` for the
downsample stage.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp


def depth_to_camera_xyz(depth, intrinsics):
    """Unproject depth images to camera-frame points.

    depth: [..., H, W]; intrinsics: [..., 3, 3] pinhole K.
    Returns xyz [..., H*W, 3] with (u+0.5, v+0.5) pixel centers.
    """
    H, W = depth.shape[-2:]
    v, u = jnp.mgrid[0:H, 0:W]
    uv1 = jnp.stack([u + 0.5, v + 0.5, jnp.ones_like(u)], axis=-1).astype(depth.dtype)  # [H, W, 3]
    inv_k = jnp.linalg.inv(intrinsics)
    rays = jnp.einsum("...ij,hwj->...hwi", inv_k, uv1)
    xyz = rays * depth[..., None]
    return xyz.reshape(*depth.shape[:-2], H * W, 3)


def transform_points(xyz, cam2world):
    """Apply homogeneous [..., 4, 4] transforms to [..., N, 3] points."""
    rot = cam2world[..., :3, :3]
    trans = cam2world[..., :3, 3]
    return jnp.einsum("...ij,...nj->...ni", rot, xyz) + trans[..., None, :]


def fuse_camera_pointclouds(
    depths,
    rgbs,
    intrinsics,
    cam2world,
    segs=None,
) -> Tuple[jnp.ndarray, jnp.ndarray, Optional[jnp.ndarray]]:
    """Fuse per-camera renders into one world-frame cloud per env.

    Args:
      depths: [B, C, H, W] per-env per-camera depth.
      rgbs: [B, C, H, W, 3] colors (any dtype, passed through).
      intrinsics: [B, C, 3, 3] or [C, 3, 3].
      cam2world: [B, C, 4, 4] camera-to-world poses.
      segs: optional [B, C, H, W, K] masks.

    Returns:
      xyz [B, C*H*W, 3] world-frame, rgb [B, C*H*W, 3], seg or None.
    """
    B, C, H, W = depths.shape
    if intrinsics.ndim == 3:
        intrinsics = jnp.broadcast_to(intrinsics, (B, C, 3, 3))
    cam_xyz = depth_to_camera_xyz(depths, intrinsics)  # [B, C, H*W, 3]
    world = transform_points(cam_xyz, cam2world)  # [B, C, H*W, 3]
    xyz = world.reshape(B, C * H * W, 3)
    rgb = rgbs.reshape(B, C * H * W, 3)
    seg = segs.reshape(B, C * H * W, -1) if segs is not None else None
    return xyz, rgb, seg
