"""Masked reductions (reference pyrl/utils/torch/ops.py:111-125 semantics)."""

from __future__ import annotations

import jax.numpy as jnp


def masked_max(x, mask, axis: int = -2, empty_value: float = 0.0):
    """Max over ``axis`` counting only positions where mask is True.

    ``mask`` broadcasts against x with a trailing feature axis of 1.
    """
    mask = jnp.asarray(mask, bool)
    neg = jnp.asarray(jnp.finfo(x.dtype).min, x.dtype)
    filled = jnp.where(mask, x, neg)
    out = filled.max(axis=axis)
    any_valid = mask.any(axis=axis)
    return jnp.where(any_valid, out, jnp.asarray(empty_value, x.dtype))


def masked_average(x, mask, axis: int = -2, eps: float = 1e-8):
    mask = jnp.asarray(mask, x.dtype)
    total = (x * mask).sum(axis=axis)
    count = mask.sum(axis=axis)
    return total / jnp.maximum(count, eps)
