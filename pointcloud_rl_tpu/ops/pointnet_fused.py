"""Fused PointNet body as a Pallas TPU kernel + winner-gather backward.

The PointNet hot path (reference pointnet.py:148-151: per-point shared MLP
-> global max-pool) is HBM-bandwidth-bound under plain XLA: each of the
three dense layers materializes a [B*N, C] activation tensor in HBM
(h1/h2/h3 at B=256, N=1536 are 100/200/400 MB), and every one is written
then read back — the measured SAC update moves ~4.4 GB/step, almost all of
it these tensors.  This kernel streams point tiles through VMEM, applies
all three layers plus LayerNorms and the running max-pool in-register, and
writes only the [B, C_out] pooled features — HBM traffic drops to "read x
once, write the pooled output".

Layer pattern matches the shipped configs (mlp_spec of 3, ignore_first_ln):
    h1 = relu(x @ W1 + b1)                     # no LN on the first layer
    h2 = relu(LN(h1 @ W2 + b2))                # eps 1e-6
    h3 = relu(LN(h2 @ W3 + b3))
    out = max over points of h3

Mixed precision mirrors the validated XLA bf16 path (models/blocks.py
DenseBlock): matmuls compute and emit bf16 (f32 accumulation inside the
MXU), LayerNorm statistics/affine run in f32, and the post-LN activation
re-enters the next matmul as bf16 — the h3 the max sees is bf16, which is
semantics-preserving because monotonic rounding commutes with max and the
model's final Dense(dtype=bf16) would cast the pooled value anyway.  The
emitted pooled output is f32 (upcast of that bf16 value).

Backward: the max-pool routes each output channel's gradient through ONE
winner point (the argmax — torch ``max`` semantics, reference
pointnet.py:151), so only <= C_out of the N points per sample carry any
gradient.  The forward emits the winner indices; the backward gathers the
winner rows ([B, C_out, C_in] instead of [B, N, C_in] — 6x fewer rows at
walker shapes), recomputes the body on them in f32, walks the chain
relu -> LN -> matmul back to dx/dW, and scatter-adds dx into the full
cloud.  Plain XLA: the tensors involved are ~65 MB, no kernel needed.

The same custom-VJP wrapper also runs without Pallas (pure-XLA forward
computing pooled+argmax) — used on CPU test meshes, and still a win over
autodiff because no [B, N, C] residual survives the forward.

The wrapper pads the point axis to the tile size with COPIES OF THE FIRST
POINT: duplicate points can never strictly exceed the true max, and the
running combine keeps the EARLIEST winner on ties, so padding can never
steal a win from a real point (tile 0 is processed first).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LN_EPS = 1e-6
_BIG_I32 = 2**30  # python int: jnp scalars would be captured consts in pallas


def _use_pallas() -> bool:
    return jax.default_backend() == "tpu"


def _ln_f32(a, gamma, beta):
    mu = a.mean(axis=-1, keepdims=True)
    var = ((a - mu) ** 2).mean(axis=-1, keepdims=True)
    return (a - mu) * jax.lax.rsqrt(var + _LN_EPS) * gamma + beta


def _body_rows(x, params, compute_dtype):
    """The 3-layer body on [rows, C_in] -> [rows, C_out].

    Mirrors DenseBlock's mixed-precision policy exactly: the Dense layers
    compute AND emit in ``compute_dtype`` (flax Dense with dtype=bf16 casts
    inputs/params to bf16 and stores bf16 outputs; the MXU still
    accumulates f32 internally), LayerNorm statistics and affine run in
    f32, and the post-LN activation is consumed by the next matmul as bf16.
    Output dtype is ``compute_dtype`` (or f32 when None) — for the final
    max-pool this is semantics-preserving: rounding is monotonic, so
    max(round(h)) == round(max(h)), the exact value the model's final
    Dense(dtype=bf16) would see.
    """
    (w1, b1, w2, b2, g2, be2, w3, b3, g3, be3) = params
    if compute_dtype is None:
        a1 = jnp.dot(x, w1, preferred_element_type=jnp.float32) + b1
        h1 = jnp.maximum(a1, 0.0)
        a2 = jnp.dot(h1, w2, preferred_element_type=jnp.float32) + b2
        h2 = jnp.maximum(_ln_f32(a2, g2, be2), 0.0)
        a3 = jnp.dot(h2, w3, preferred_element_type=jnp.float32) + b3
        return jnp.maximum(_ln_f32(a3, g3, be3), 0.0)
    c = compute_dtype
    # f32 accumulate (mosaic requires 32-bit matmul acc), result stored bf16
    dot = lambda a, b: jnp.dot(a.astype(c), b.astype(c), preferred_element_type=jnp.float32)
    h1 = jnp.maximum(dot(x, w1) + b1, 0.0).astype(c)
    a2 = dot(h1, w2) + b2
    h2 = jnp.maximum(_ln_f32(a2, g2, be2), 0.0).astype(c)
    a3 = dot(h2, w3) + b3
    return jnp.maximum(_ln_f32(a3, g3, be3), 0.0).astype(c)


def _tile_max_argmax(h3):
    """Per-tile max + FIRST-index argmax over the point axis.

    h3: [TB, TN, C].  Returns ([TB, C] max, [TB, C] int32 local argmax).
    iota-min trick instead of jnp.argmax (guaranteed lowering on mosaic).
    """
    m = h3.max(axis=1)
    eq = h3 >= m[:, None, :]  # == on the max rows; >= keeps it mask-safe
    iota = jax.lax.broadcasted_iota(jnp.int32, h3.shape, 1)
    idx = jnp.where(eq, iota, _BIG_I32).min(axis=1)
    return m, idx


def _fwd_kernel(x_ref, w1, b1, w2, b2, g2, be2, w3, b3, g3, be3,
                out_ref, idx_ref, *, compute_dtype):
    i_n = pl.program_id(1)
    tb, tn, c_in = x_ref.shape
    x = x_ref[...].reshape(tb * tn, c_in)
    params = (w1[...], b1[...], w2[...], b2[...], g2[...], be2[...],
              w3[...], b3[...], g3[...], be3[...])
    h3 = _body_rows(x, params, compute_dtype).reshape(tb, tn, -1)
    # max/argmax in f32: lossless upcast of the (bf16-rounded) h3 values,
    # and bf16 3-D broadcast compares trip a mosaic relayout bug
    tile_max, tile_idx = _tile_max_argmax(h3.astype(jnp.float32))
    tile_idx = tile_idx + i_n * tn  # global point index

    @pl.when(i_n == 0)
    def _():
        out_ref[...] = tile_max
        idx_ref[...] = tile_idx

    @pl.when(i_n != 0)
    def _():
        upd = tile_max > out_ref[...]  # strict >: earliest winner kept on ties
        out_ref[...] = jnp.where(upd, tile_max, out_ref[...])
        idx_ref[...] = jnp.where(upd, tile_idx, idx_ref[...])


def _fwd_kernel_max_only(x_ref, w1, b1, w2, b2, g2, be2, w3, b3, g3, be3,
                         out_ref, *, compute_dtype):
    """No-argmax variant for undifferentiated forwards (the SAC update's
    target and next-obs encodes): skips the eq/iota/min winner search —
    only the backward needs winner indices."""
    i_n = pl.program_id(1)
    tb, tn, c_in = x_ref.shape
    x = x_ref[...].reshape(tb * tn, c_in)
    params = (w1[...], b1[...], w2[...], b2[...], g2[...], be2[...],
              w3[...], b3[...], g3[...], be3[...])
    h3 = _body_rows(x, params, compute_dtype).reshape(tb, tn, -1)
    tile_max = h3.astype(jnp.float32).max(axis=1)

    @pl.when(i_n == 0)
    def _():
        out_ref[...] = tile_max

    @pl.when(i_n != 0)
    def _():
        out_ref[...] = jnp.maximum(out_ref[...], tile_max)


def _forward_pallas(x, params, tile_n, tile_b, compute_dtype, with_idx=True):
    (w1, *_rest) = params
    B, N, C_in = x.shape
    C_out = params[6].shape[-1]
    if compute_dtype is not None:
        x = x.astype(compute_dtype)  # halve the x HBM read + VMEM tiles
    n_pad = -N % tile_n
    if n_pad:
        x = jnp.concatenate([x, jnp.broadcast_to(x[:, :1], (B, n_pad, C_in))], axis=1)
    b_pad = -B % tile_b
    if b_pad:
        x = jnp.concatenate([x, jnp.zeros((b_pad,) + x.shape[1:], x.dtype)], axis=0)
    b_tiles = x.shape[0] // tile_b
    n_tiles = x.shape[1] // tile_n

    flops = 2 * x.shape[0] * x.shape[1] * (
        C_in * params[0].shape[-1]
        + params[0].shape[-1] * params[2].shape[-1]
        + params[2].shape[-1] * C_out
    )
    weight_spec = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    row_spec = lambda: pl.BlockSpec((tile_b, C_out), lambda b, n: (b, 0), memory_space=pltpu.VMEM)
    kernel = _fwd_kernel if with_idx else _fwd_kernel_max_only
    out_specs = [row_spec(), row_spec()] if with_idx else row_spec()
    out_shape = [
        jax.ShapeDtypeStruct((x.shape[0], C_out), jnp.float32),
        jax.ShapeDtypeStruct((x.shape[0], C_out), jnp.int32),
    ]
    outs = pl.pallas_call(
        functools.partial(kernel, compute_dtype=compute_dtype),
        grid=(b_tiles, n_tiles),
        in_specs=[
            pl.BlockSpec((tile_b, tile_n, C_in), lambda b, n: (b, n, 0), memory_space=pltpu.VMEM),
            *[weight_spec() for _ in range(10)],
        ],
        out_specs=out_specs,
        out_shape=out_shape if with_idx else out_shape[0],
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=x.size * x.dtype.itemsize, transcendentals=0
        ),
    )(x, *params)
    pooled, idx = outs if with_idx else (outs, None)
    if b_pad:
        pooled = pooled[:B]
        idx = idx[:B] if idx is not None else None
    return pooled, idx


def _forward_xla(x, params, compute_dtype, with_idx=True):
    B, N, C_in = x.shape
    h3 = _body_rows(x.reshape(B * N, C_in), params, compute_dtype).reshape(B, N, -1)
    if not with_idx:  # act/eval forwards need no winner indices
        return h3.max(axis=1).astype(jnp.float32), None
    m, idx = _tile_max_argmax(h3)
    return m.astype(jnp.float32), idx


# --------------------------------------------------------------- backward
def _relu_mask(a):
    return jnp.where(a > 0.0, 1.0, 0.0)


def _ln_bwd(dn, xhat, rstd, gamma):
    dy = dn * gamma
    return rstd * (dy - dy.mean(axis=-1, keepdims=True)
                   - xhat * (dy * xhat).mean(axis=-1, keepdims=True))


def _winner_backward(x, params, idx, g):
    """Gradient via the winner rows only.

    x: [B, N, C_in] f32; idx: [B, K] int32 winner point per output channel
    (K == C_out); g: [B, K] pooled-output cotangent.  All math in f32.
    """
    (w1, b1, w2, b2, g2, be2, w3, b3, g3, be3) = params
    B, N, C_in = x.shape
    K = idx.shape[-1]

    # Flat single-axis gather instead of take_along_axis: the batched-gather
    # lowering was measured HBM-bound at ~0.5 ms/update on v5e (profile,
    # tools/exp_update_profile.py) vs microseconds for a flat row take.
    # promise_in_bounds is safe: winners come from the forward's iota-min
    # over real points (padding can never win — see module docstring).
    flat_idx = (jnp.arange(B, dtype=jnp.int32)[:, None] * N + idx.astype(jnp.int32)).reshape(-1)
    rows = x.reshape(B * N, C_in).at[flat_idx].get(mode="promise_in_bounds")  # [B*K, C_in]

    # recompute the chain on winner rows, keeping residuals (f32)
    a1 = jnp.dot(rows, w1, preferred_element_type=jnp.float32) + b1
    h1 = jnp.maximum(a1, 0.0)
    a2 = jnp.dot(h1, w2, preferred_element_type=jnp.float32) + b2
    mu2 = a2.mean(axis=-1, keepdims=True)
    rstd2 = jax.lax.rsqrt(((a2 - mu2) ** 2).mean(axis=-1, keepdims=True) + _LN_EPS)
    xhat2 = (a2 - mu2) * rstd2
    n2 = xhat2 * g2 + be2
    h2 = jnp.maximum(n2, 0.0)
    a3 = jnp.dot(h2, w3, preferred_element_type=jnp.float32) + b3
    mu3 = a3.mean(axis=-1, keepdims=True)
    rstd3 = jax.lax.rsqrt(((a3 - mu3) ** 2).mean(axis=-1, keepdims=True) + _LN_EPS)
    xhat3 = (a3 - mu3) * rstd3
    n3 = xhat3 * g3 + be3

    # dh3 for winner row k is g[b, k] on channel k only (the row owns
    # exactly its channel's pooled output)
    eye = jnp.eye(K, dtype=jnp.float32)
    dh3 = (g[:, :, None] * eye[None]).reshape(B * K, K)

    dn3 = dh3 * _relu_mask(n3)
    da3 = _ln_bwd(dn3, xhat3, rstd3, g3)
    dh2 = jnp.dot(da3, w3.T, preferred_element_type=jnp.float32)
    dn2 = dh2 * _relu_mask(n2)
    da2 = _ln_bwd(dn2, xhat2, rstd2, g2)
    dh1 = jnp.dot(da2, w2.T, preferred_element_type=jnp.float32)
    da1 = dh1 * _relu_mask(a1)
    dxw = jnp.dot(da1, w1.T, preferred_element_type=jnp.float32).reshape(B, K, C_in)

    dx = jnp.zeros_like(x).at[
        jnp.arange(B)[:, None], idx.astype(jnp.int32)
    ].add(dxw.astype(x.dtype), mode="drop")

    dparams = (
        jnp.dot(rows.T, da1, preferred_element_type=jnp.float32),
        da1.sum(axis=0),
        jnp.dot(h1.T, da2, preferred_element_type=jnp.float32),
        da2.sum(axis=0),
        (dn2 * xhat2).sum(axis=0),
        dn2.sum(axis=0),
        jnp.dot(h2.T, da3, preferred_element_type=jnp.float32),
        da3.sum(axis=0),
        (dn3 * xhat3).sum(axis=0),
        dn3.sum(axis=0),
    )
    return dx, dparams


# ------------------------------------------------------------------ API
@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def fused_pointnet_body(x, params, tile_n: int = 512, tile_b: int = 8,
                        compute_dtype=None):
    """x: [B, N, C_in] float32; params: 10-tuple (w1,b1,w2,b2,g2,be2,w3,b3,g3,be3).
    Returns [B, C_out] pooled features (f32).  ``compute_dtype=jnp.bfloat16``
    enables mixed-precision matmuls (same policy as DenseBlock)."""
    if _use_pallas():
        pooled, _ = _forward_pallas(x, params, tile_n, tile_b, compute_dtype, with_idx=False)
    else:
        pooled, _ = _forward_xla(x, params, compute_dtype, with_idx=False)
    return pooled


def _fwd(x, params, tile_n, tile_b, compute_dtype):
    if _use_pallas():
        pooled, idx = _forward_pallas(x, params, tile_n, tile_b, compute_dtype)
    else:
        pooled, idx = _forward_xla(x, params, compute_dtype)
    return pooled, (x, params, idx)


def _bwd(tile_n, tile_b, compute_dtype, res, g):
    x, params, idx = res
    dx, dparams = _winner_backward(x, params, idx, g)
    return dx, dparams


fused_pointnet_body.defvjp(_fwd, _bwd)
