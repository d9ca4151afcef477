"""On-device batched point-cloud downsampling.

The reference's ManiSkill2 server-render path used a CUDA op
(``pyrl.utils.cpp_ops.downsample_pcd``, absent from its snapshot) to
downsample fused point clouds for a whole vec-env batch on the GPU.  This is
the TPU equivalent: ``pcd_base`` semantics (ground filter, guaranteed
minimum per segmentation mask, proportional foreground split, background
fill, pad-by-tiling) vectorized over the batch with static shapes — group
membership ranking via per-group randomized argsort instead of host loops.

For single observations inside env workers, prefer the host paths
(env/obs_process.py or the C++ kernels in csrc/); this op is for pipelines
where the clouds are already on device.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

_BIG = 1e9


def seg_balanced_downsample(
    key,
    xyz,
    seg,
    n_points: int,
    min_pts: int = 50,
    fg_pts: int = 800,
    ground_eps: float = 1e-3,
) -> jnp.ndarray:
    """Choose ``n_points`` indices per cloud (pcd_base semantics, batched).

    Args:
      xyz: [B, N, 3] channel-last points.
      seg: [B, N, K] boolean masks.
    Returns:
      indices [B, n_points] int32 into the N axis (tiled when short).
    """
    B, N, _ = xyz.shape
    K = seg.shape[-1]
    keep = xyz[..., 2] > ground_eps  # [B, N]
    seg = seg.astype(bool) & keep[..., None]
    bg = keep & ~seg.any(-1)
    groups = jnp.concatenate([seg, bg[..., None]], axis=-1)  # [B, N, K+1]

    # budgets (observation_process.py:41-51)
    counts = groups[..., :K].sum(axis=1)  # [B, K]
    base = jnp.minimum(counts, min_pts)
    remain = counts - base
    denom = jnp.maximum(remain.sum(-1, keepdims=True), 1)
    tgt = base + (fg_pts - base.sum(-1, keepdims=True)) * remain // denom  # [B, K]
    back = n_points - tgt.sum(-1, keepdims=True)
    budgets = jnp.concatenate([tgt, back], axis=-1)  # [B, K+1]
    budgets = jnp.minimum(budgets, groups.sum(axis=1))  # cap by availability

    # Rank members of each group in a random order: rank < budget => selected.
    rand = jax.random.uniform(key, (B, N, K + 1))
    priority = jnp.where(groups, rand, _BIG)  # non-members sort last
    order = jnp.argsort(priority, axis=1)  # [B, N, K+1] indices into N
    iota = jax.lax.broadcasted_iota(jnp.int32, order.shape, 1)
    # rank of each point within its group = inverse permutation of `order`
    invert = lambda o, i: jnp.zeros_like(o).at[o].set(i)
    inv = jax.vmap(jax.vmap(invert, in_axes=(-1, -1), out_axes=-1))(order, iota)
    selected = groups & (inv < budgets[:, None, :])  # [B, N, K+1]
    selected_any = selected.any(-1)  # [B, N]

    # compact selected indices to the front in random order, then tile
    k2 = jax.random.fold_in(key, 1)
    rand2 = jax.random.uniform(k2, (B, N))
    sort_key = jnp.where(selected_any, rand2, _BIG + rand2)
    order2 = jnp.argsort(sort_key, axis=1)  # selected first
    n_sel = jnp.maximum(selected_any.sum(-1), 1)  # [B]
    pos = jnp.arange(n_points)[None, :]
    idx = jnp.take_along_axis(order2, pos % n_sel[:, None], axis=1)
    return idx.astype(jnp.int32)


def uniform_downsample(key, xyz, n_points: int, ground_eps: Optional[float] = 1e-3) -> jnp.ndarray:
    """Uniform random subset with pad-by-tiling (pcd_uniform_downsample)."""
    B, N, _ = xyz.shape
    valid = xyz[..., 2] > ground_eps if ground_eps is not None else jnp.ones(xyz.shape[:2], bool)
    rand = jax.random.uniform(key, (B, N))
    sort_key = jnp.where(valid, rand, _BIG + rand)
    order = jnp.argsort(sort_key, axis=1)
    n_valid = jnp.maximum(valid.sum(-1), 1)
    pos = jnp.arange(n_points)[None, :]
    return jnp.take_along_axis(order, pos % n_valid[:, None], axis=1).astype(jnp.int32)
