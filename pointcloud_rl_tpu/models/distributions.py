"""Pure-JAX policy distributions.

Re-implements the reference's distribution math
(``pyrl/utils/torch/distributions.py``) as stateless functions over
(mean, std) arrays: ScaledTanhNormal (SAC squashed Gaussian with the exact
epsilon-stabilized log-prob correction of distributions.py:89), ScaledNormal,
and categorical helpers.  Log-probs sum over the last (action) axis, matching
CustomIndependent(…, 1).
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp

_LOG_SQRT_2PI = 0.5 * math.log(2.0 * math.pi)


def normal_log_prob(x, mean, std):
    var = std * std
    return -((x - mean) ** 2) / (2 * var) - jnp.log(std) - _LOG_SQRT_2PI


def normal_entropy(std):
    return 0.5 + _LOG_SQRT_2PI + jnp.log(std)


# ---------------------------------------------------------------------------
# ScaledNormal: N(mean*scale+bias, std*scale)
# ---------------------------------------------------------------------------
def scaled_normal_rsample(key, mean, std, scale, bias):
    loc = mean * scale + bias
    s = std * scale
    z = loc + s * jax.random.normal(key, mean.shape, mean.dtype)
    return z


def scaled_normal_log_prob(x, mean, std, scale, bias):
    loc = mean * scale + bias
    s = std * scale
    return normal_log_prob(x, loc, s).sum(-1)


def scaled_normal_rsample_with_log_prob(key, mean, std, scale, bias):
    x = scaled_normal_rsample(key, mean, std, scale, bias)
    return x, scaled_normal_log_prob(x, mean, std, scale, bias)


# ---------------------------------------------------------------------------
# ScaledTanhNormal: tanh(N(mean, std)) * scale + bias
# ---------------------------------------------------------------------------
def tanh_transform(z, scale, bias):
    return jnp.tanh(z) * scale + bias


def tanh_log_prob_with_logit(z, mean, std, scale, epsilon=1e-6):
    """log-density of tanh(z)*scale+bias given pre-tanh logit z.

    Uses the reference's epsilon-in-log form (distributions.py:89):
    ``log p(x) - log(scale * (1 - tanh(z)^2) + eps)`` summed over actions.
    """
    log_p = normal_log_prob(z, mean, std)
    log_p = log_p - jnp.log(scale * (1.0 - jnp.tanh(z) ** 2) + epsilon)
    return log_p.sum(-1)


def tanh_normal_rsample_with_log_prob(key, mean, std, scale, bias, epsilon=1e-6):
    z = mean + std * jax.random.normal(key, mean.shape, mean.dtype)
    return tanh_transform(z, scale, bias), tanh_log_prob_with_logit(z, mean, std, scale, epsilon)


def tanh_normal_sample(key, mean, std, scale, bias):
    z = mean + std * jax.random.normal(key, mean.shape, mean.dtype)
    return tanh_transform(z, scale, bias)


def tanh_normal_mean(mean, scale, bias):
    return tanh_transform(mean, scale, bias)


def tanh_normal_log_prob(x, mean, std, scale, bias, epsilon=1e-6):
    z = jnp.arctanh(jnp.clip((x - bias) / scale, -1.0 + 1e-6, 1.0 - 1e-6))
    return tanh_log_prob_with_logit(z, mean, std, scale, epsilon)


# ---------------------------------------------------------------------------
# Categorical (discrete SAC)
# ---------------------------------------------------------------------------
def categorical_sample(key, logits):
    return jax.random.categorical(key, logits, axis=-1)


def categorical_probs(logits):
    return jax.nn.softmax(logits, axis=-1)


def categorical_entropy(logits):
    logp = jax.nn.log_softmax(logits, axis=-1)
    p = jnp.exp(logp)
    return -(p * logp).sum(-1)


def categorical_log_prob(logits, actions):
    logp = jax.nn.log_softmax(logits, axis=-1)
    actions = actions.astype(jnp.int32)
    if actions.ndim == logp.ndim:
        actions = actions[..., 0]
    return jnp.take_along_axis(logp, actions[..., None], axis=-1)[..., 0]
