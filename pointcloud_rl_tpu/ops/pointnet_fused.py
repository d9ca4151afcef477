"""Fused PointNet body as a Pallas TPU kernel.

The PointNet hot path (reference pointnet.py:148-151: per-point shared MLP
-> global max-pool) is HBM-bandwidth-bound under plain XLA: each of the
three dense layers materializes a [B, N, C] activation tensor in HBM
(~400 MB at B=256, N=1536, C=256).  This kernel streams point tiles through
VMEM, applies all three layers plus LayerNorms and the running max-pool
in-register, and writes only the [B, C_out] pooled features — HBM traffic
drops from ~7 tensors to "read x once, write the pooled output".

Layer pattern matches the shipped configs (mlp_spec of 3, ignore_first_ln):
    h1 = relu(x @ W1 + b1)                     # no LN on the first layer
    h2 = relu(LN(h1 @ W2 + b2))                # eps 1e-6
    h3 = relu(LN(h2 @ W3 + b3))
    out = max over points of h3

Backward: fused Pallas kernels as well — two passes that recompute the body
tile-by-tile in VMEM (in-kernel rematerialization, so no [B, N, C]
activation ever hits HBM in either direction):

1. a tie-count pass: ``jnp.max``'s VJP splits the gradient EVENLY among
   points tying for the channel max (ties are common — ReLU zeros whole
   channels), so the backward needs the per-(b, c) tie count first;
2. a gradient pass: recompute a1/h1/a2/h2/a3/h3 for the tile, distribute
   the pooled gradient over ties, then walk the chain
   relu -> LN -> matmul three times, writing the dx tile and accumulating
   weight/bias/LN grads in VMEM-resident outputs across the (sequential)
   TPU grid.

HBM traffic per direction is "read x (+ write dx), touch the tiny params"
instead of plain XLA's ~10 full activation tensors.

The wrapper pads the point axis to the tile size with COPIES OF THE FIRST
POINT: duplicate points can never change a max, so no masking is needed in
the kernel (same trick as the env samplers' pad-by-tiling).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LN_EPS = 1e-6


def _ln(h, gamma, beta):
    mu = h.mean(axis=-1, keepdims=True)
    var = ((h - mu) ** 2).mean(axis=-1, keepdims=True)
    return (h - mu) * jax.lax.rsqrt(var + _LN_EPS) * gamma + beta


def _body_tile(x, w1, b1, w2, b2, g2, be2, w3, b3, g3, be3):
    h = jnp.maximum(jnp.dot(x, w1, preferred_element_type=jnp.float32) + b1, 0.0)
    h = jnp.maximum(_ln(jnp.dot(h, w2, preferred_element_type=jnp.float32) + b2, g2, be2), 0.0)
    h = jnp.maximum(_ln(jnp.dot(h, w3, preferred_element_type=jnp.float32) + b3, g3, be3), 0.0)
    return h


def _kernel(x_ref, w1, b1, w2, b2, g2, be2, w3, b3, g3, be3, out_ref):
    i_n = pl.program_id(1)
    tb, tn, c_in = x_ref.shape
    x = x_ref[...].reshape(tb * tn, c_in)  # fold batch tile into rows for one big matmul
    h = _body_tile(x, w1[...], b1[...], w2[...], b2[...], g2[...], be2[...],
                   w3[...], b3[...], g3[...], be3[...])
    tile_max = h.reshape(tb, tn, -1).max(axis=1)  # [TB, C_out]

    @pl.when(i_n == 0)
    def _():
        out_ref[...] = tile_max

    @pl.when(i_n != 0)
    def _():
        out_ref[...] = jnp.maximum(out_ref[...], tile_max)


def _reference_body(x, params):
    """Plain-XLA implementation (ground truth + backward remat)."""
    (w1, b1, w2, b2, g2, be2, w3, b3, g3, be3) = params
    h = _body_tile(x, w1, b1, w2, b2, g2, be2, w3, b3, g3, be3)
    return h.max(axis=-2)


def _pallas_forward(x, params, tile_n: int, tile_b: int = 8):
    (w1, b1, w2, b2, g2, be2, w3, b3, g3, be3) = params
    B, N, C_in = x.shape
    n_pad = -N % tile_n
    if n_pad:
        # duplicate-point padding: never affects the max
        x = jnp.concatenate([x, jnp.broadcast_to(x[:, :1], (B, n_pad, C_in))], axis=1)
    b_pad = -B % tile_b
    if b_pad:
        x = jnp.concatenate([x, jnp.zeros((b_pad,) + x.shape[1:], x.dtype)], axis=0)
    n_tiles = x.shape[1] // tile_n
    b_tiles = x.shape[0] // tile_b
    C_out = w3.shape[-1]

    weight_spec = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _kernel,
        grid=(b_tiles, n_tiles),
        in_specs=[
            pl.BlockSpec((tile_b, tile_n, C_in), lambda b, n: (b, n, 0), memory_space=pltpu.VMEM),
            *[weight_spec() for _ in range(10)],
        ],
        out_specs=pl.BlockSpec((tile_b, C_out), lambda b, n: (b, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((x.shape[0], C_out), jnp.float32),
        interpret=jax.default_backend() != "tpu",  # CPU test mesh fallback
    )(x, w1, b1, w2, b2, g2, be2, w3, b3, g3, be3)
    return out[:B] if b_pad else out


# --------------------------------------------------------------- backward
def _relu_mask(a):
    """d/da maximum(a, 0): 1 where a>0, 0.5 at exact zeros (jnp.maximum's
    tie rule — zero inputs DO occur for zero-padded batch rows)."""
    return jnp.where(a > 0, 1.0, jnp.where(a == 0, 0.5, 0.0))


def _body_intermediates(x, w1, b1, w2, b2, g2, be2, w3, b3, g3, be3):
    """Recompute the body keeping residuals; op order mirrors _body_tile
    bit-for-bit so h3 == pooled comparisons match the forward kernel."""
    a1 = jnp.dot(x, w1, preferred_element_type=jnp.float32) + b1
    h1 = jnp.maximum(a1, 0.0)
    a2 = jnp.dot(h1, w2, preferred_element_type=jnp.float32) + b2
    mu2 = a2.mean(axis=-1, keepdims=True)
    var2 = ((a2 - mu2) ** 2).mean(axis=-1, keepdims=True)
    rstd2 = jax.lax.rsqrt(var2 + _LN_EPS)
    xhat2 = (a2 - mu2) * rstd2
    n2 = xhat2 * g2 + be2
    h2 = jnp.maximum(n2, 0.0)
    a3 = jnp.dot(h2, w3, preferred_element_type=jnp.float32) + b3
    mu3 = a3.mean(axis=-1, keepdims=True)
    var3 = ((a3 - mu3) ** 2).mean(axis=-1, keepdims=True)
    rstd3 = jax.lax.rsqrt(var3 + _LN_EPS)
    xhat3 = (a3 - mu3) * rstd3
    n3 = xhat3 * g3 + be3
    h3 = jnp.maximum(n3, 0.0)
    return a1, h1, xhat2, rstd2, n2, h2, xhat3, rstd3, n3, h3


def _ln_bwd(dn, xhat, rstd, gamma):
    dy = dn * gamma
    return rstd * (dy - dy.mean(axis=-1, keepdims=True)
                   - xhat * (dy * xhat).mean(axis=-1, keepdims=True))


def _ties_kernel(n_real_ref, x_ref, pooled_ref,
                 w1, b1, w2, b2, g2, be2, w3, b3, g3, be3, ties_ref):
    i_n = pl.program_id(1)
    tb, tn, c_in = x_ref.shape
    x = x_ref[...].reshape(tb * tn, c_in)
    *_, h3 = _body_intermediates(x, w1[...], b1[...], w2[...], b2[...], g2[...], be2[...],
                                 w3[...], b3[...], g3[...], be3[...])
    h3 = h3.reshape(tb, tn, -1)
    # only rows inside the real point range may tie (padding duplicates
    # point 0 and must not inflate the split count)
    row = i_n * tn + jax.lax.broadcasted_iota(jnp.int32, (tb, tn, 1), 1)
    valid = row < n_real_ref[0]
    tie = jnp.where((h3 == pooled_ref[...][:, None, :]) & valid, 1.0, 0.0).sum(axis=1)

    @pl.when(i_n == 0)
    def _():
        ties_ref[...] = tie

    @pl.when(i_n != 0)
    def _():
        ties_ref[...] = ties_ref[...] + tie


def _grad_kernel(n_real_ref, x_ref, g_ref, pooled_ref, ties_ref,
                 w1, b1, w2, b2, g2, be2, w3, b3, g3, be3,
                 dx_ref, dw1, db1, dw2, db2, dg2, dbe2, dw3, db3, dg3, dbe3):
    i_b = pl.program_id(0)
    i_n = pl.program_id(1)
    tb, tn, c_in = x_ref.shape
    x = x_ref[...].reshape(tb * tn, c_in)
    (a1, h1, xhat2, rstd2, n2, h2, xhat3, rstd3, n3, h3) = _body_intermediates(
        x, w1[...], b1[...], w2[...], b2[...], g2[...], be2[...],
        w3[...], b3[...], g3[...], be3[...])

    c_out = h3.shape[-1]
    h3t = h3.reshape(tb, tn, c_out)
    row = i_n * tn + jax.lax.broadcasted_iota(jnp.int32, (tb, tn, 1), 1)
    valid = row < n_real_ref[0]
    is_max = (h3t == pooled_ref[...][:, None, :]) & valid
    share = g_ref[...][:, None, :] / jnp.maximum(ties_ref[...][:, None, :], 1.0)
    dh3 = jnp.where(is_max, share, 0.0).reshape(tb * tn, c_out)

    dn3 = dh3 * _relu_mask(n3)
    da3 = _ln_bwd(dn3, xhat3, rstd3, g3[...])
    dh2 = jnp.dot(da3, w3[...].T, preferred_element_type=jnp.float32)
    dn2 = dh2 * _relu_mask(n2)
    da2 = _ln_bwd(dn2, xhat2, rstd2, g2[...])
    dh1 = jnp.dot(da2, w2[...].T, preferred_element_type=jnp.float32)
    da1 = dh1 * _relu_mask(a1)
    dx_ref[...] = jnp.dot(da1, w1[...].T, preferred_element_type=jnp.float32).reshape(tb, tn, c_in)

    first = (i_b == 0) & (i_n == 0)
    updates = (
        (dw1, jnp.dot(x.T, da1, preferred_element_type=jnp.float32)),
        (db1, da1.sum(axis=0)),
        (dw2, jnp.dot(h1.T, da2, preferred_element_type=jnp.float32)),
        (db2, da2.sum(axis=0)),
        (dg2, (dn2 * xhat2).sum(axis=0)),
        (dbe2, dn2.sum(axis=0)),
        (dw3, jnp.dot(h2.T, da3, preferred_element_type=jnp.float32)),
        (db3, da3.sum(axis=0)),
        (dg3, (dn3 * xhat3).sum(axis=0)),
        (dbe3, dn3.sum(axis=0)),
    )

    @pl.when(first)
    def _():
        for ref, val in updates:
            ref[...] = val

    @pl.when(jnp.logical_not(first))
    def _():
        for ref, val in updates:
            ref[...] = ref[...] + val


def _pallas_backward(x, params, pooled, g, tile_n: int, tile_b: int = 8):
    (w1, b1, w2, b2, g2, be2, w3, b3, g3, be3) = params
    B, N, C_in = x.shape
    C_out = w3.shape[-1]
    n_pad = -N % tile_n
    if n_pad:
        x = jnp.concatenate([x, jnp.broadcast_to(x[:, :1], (B, n_pad, C_in))], axis=1)
    b_pad = -B % tile_b
    if b_pad:
        x = jnp.concatenate([x, jnp.zeros((b_pad,) + x.shape[1:], x.dtype)], axis=0)
        pooled = jnp.concatenate([pooled, jnp.zeros((b_pad, C_out), pooled.dtype)], axis=0)
        g = jnp.concatenate([g, jnp.zeros((b_pad, C_out), g.dtype)], axis=0)
    Bp, Np = x.shape[0], x.shape[1]
    b_tiles, n_tiles = Bp // tile_b, Np // tile_n
    n_real = jnp.asarray([N], jnp.int32)

    weight_spec = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    interpret = jax.default_backend() != "tpu"
    brow = lambda b, n: (b, 0)

    ties = pl.pallas_call(
        _ties_kernel,
        grid=(b_tiles, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((tile_b, tile_n, C_in), lambda b, n: (b, n, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, C_out), brow, memory_space=pltpu.VMEM),
            *[weight_spec() for _ in range(10)],
        ],
        out_specs=pl.BlockSpec((tile_b, C_out), brow, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, C_out), jnp.float32),
        interpret=interpret,
    )(n_real, x, pooled, w1, b1, w2, b2, g2, be2, w3, b3, g3, be3)

    const = lambda b, n: tuple(0 for _ in range(2))
    grad_specs = [
        pl.BlockSpec((w1.shape[0], w1.shape[1]), const, memory_space=pltpu.VMEM),
        pl.BlockSpec((b1.shape[0],), lambda b, n: (0,), memory_space=pltpu.VMEM),
        pl.BlockSpec((w2.shape[0], w2.shape[1]), const, memory_space=pltpu.VMEM),
        pl.BlockSpec((b2.shape[0],), lambda b, n: (0,), memory_space=pltpu.VMEM),
        pl.BlockSpec((g2.shape[0],), lambda b, n: (0,), memory_space=pltpu.VMEM),
        pl.BlockSpec((be2.shape[0],), lambda b, n: (0,), memory_space=pltpu.VMEM),
        pl.BlockSpec((w3.shape[0], w3.shape[1]), const, memory_space=pltpu.VMEM),
        pl.BlockSpec((b3.shape[0],), lambda b, n: (0,), memory_space=pltpu.VMEM),
        pl.BlockSpec((g3.shape[0],), lambda b, n: (0,), memory_space=pltpu.VMEM),
        pl.BlockSpec((be3.shape[0],), lambda b, n: (0,), memory_space=pltpu.VMEM),
    ]
    out_shapes = [jax.ShapeDtypeStruct((Bp, Np, C_in), jnp.float32)] + [
        jax.ShapeDtypeStruct(p.shape, jnp.float32) for p in params
    ]
    outs = pl.pallas_call(
        _grad_kernel,
        grid=(b_tiles, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((tile_b, tile_n, C_in), lambda b, n: (b, n, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, C_out), brow, memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, C_out), brow, memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, C_out), brow, memory_space=pltpu.VMEM),
            *[weight_spec() for _ in range(10)],
        ],
        out_specs=[pl.BlockSpec((tile_b, tile_n, C_in), lambda b, n: (b, n, 0), memory_space=pltpu.VMEM)]
        + grad_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(n_real, x, g, pooled, ties, w1, b1, w2, b2, g2, be2, w3, b3, g3, be3)
    dx = outs[0][:B, :N]
    return dx, tuple(outs[1:])


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def fused_pointnet_body(x, params, tile_n: int = 256):
    """x: [B, N, C_in] float32; params: 10-tuple of layer weights.
    Returns [B, C_out] pooled features."""
    return _pallas_forward(x, params, tile_n)


def _fwd(x, params, tile_n):
    out = _pallas_forward(x, params, tile_n)
    return out, (x, params, out)


def _bwd(tile_n, res, g):
    x, params, pooled = res
    return _pallas_backward(x, params, pooled, g, tile_n)


fused_pointnet_body.defvjp(_fwd, _bwd)
