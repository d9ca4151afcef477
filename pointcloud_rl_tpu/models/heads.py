"""Regression heads: map MLP features to actions/distribution outputs.

Parity targets: reference ``pyrl/networks/regression_heads/{regression_base,
gaussian,deterministic}.py``.  Heads are flax modules whose ``__call__`` takes
``mode`` (static): "mean"/"eval", "explore"/"sample", "max-entropy"
(= rsample-with-neg-logp, returning ``(action, neg_logp[..., None])``),
"dist" (returns ``(mean, std)``), "std", "log_std", "entropy", "logits", "p".
Sampling modes draw from the 'sample' rng stream.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.nn
import jax.numpy as jnp
import numpy as np

from . import REGRESSION
from .distributions import (
    categorical_entropy,
    categorical_probs,
    categorical_sample,
    normal_entropy,
    tanh_normal_mean,
    tanh_normal_rsample_with_log_prob,
    tanh_normal_sample,
    scaled_normal_rsample,
    scaled_normal_rsample_with_log_prob,
)


def _bound_scale_bias(bound, dim_output):
    if bound is None:
        return None, jnp.ones(dim_output, jnp.float32), jnp.zeros(dim_output, jnp.float32)
    lb = np.broadcast_to(np.asarray(bound[0], np.float32), (dim_output,))
    ub = np.broadcast_to(np.asarray(bound[1], np.float32), (dim_output,))
    scale = jnp.asarray((ub - lb) / 2.0)
    bias = jnp.asarray((ub + lb) / 2.0)
    return (jnp.asarray(lb), jnp.asarray(ub)), scale, bias


class ContinuousHeadBase(nn.Module):
    """Shared bound handling (reference regression_base.py:10-48)."""

    dim_output: int
    bound: Optional[Any] = None
    clip_return: bool = False
    num_heads: int = 1

    def _bounds(self):
        return _bound_scale_bias(self.bound, self.dim_output)

    def clamp(self, x):
        bounds, _, _ = self._bounds()
        if self.clip_return and bounds is not None:
            x = jnp.clip(x, bounds[0], bounds[1])
        return x

    def uniform(self, key, batch: int):
        """Uniform random actions + their log-prob (warm-up exploration)."""
        bounds, _, _ = self._bounds()
        assert bounds is not None, "uniform sampling needs bounds"
        lb, ub = bounds
        r = jax.random.uniform(key, (batch, self.dim_output))
        log_p = jnp.log(1.0 / (ub - lb)).sum()
        return r * ub + (1 - r) * lb, jnp.full((batch,), log_p)


@REGRESSION.register_module()
class TanhGaussianHead(ContinuousHeadBase):
    """SAC squashed Gaussian (reference gaussian.py:72).

    Feature layout: [..., 2*dim_output] = concat(mean, log_std) when
    ``predict_std``; log_std clamped to ``log_std_bound`` before exp.
    """

    predict_std: bool = True
    init_log_std: float = -0.5
    log_std_bound: Sequence[float] = (-20.0, 2.0)
    epsilon: float = 1e-6

    @property
    def dim_feature(self) -> int:
        return self.dim_output * (2 if self.predict_std else 1)

    def _mean_std(self, feature):
        if self.predict_std:
            assert feature.shape[-1] == 2 * self.dim_output, f"{feature.shape} vs 2*{self.dim_output}"
            mean, log_std = jnp.split(feature, 2, axis=-1)
        else:
            mean = feature
            log_std = self.param("log_std", lambda k, s: jnp.full(s, self.init_log_std), (1, self.dim_output))
            log_std = jnp.broadcast_to(log_std, mean.shape)
        log_std = jnp.clip(log_std, self.log_std_bound[0], self.log_std_bound[1])
        return mean, jnp.exp(log_std)

    @nn.compact
    def __call__(self, feature, mode: str = "explore"):
        mean, std = self._mean_std(feature)
        _, scale, bias = self._bounds()
        parts = ["rsample-with-neg-logp"] if mode == "max-entropy" else mode.split("_")
        ret = []
        for m in parts:
            if m in ("mean", "eval"):
                ret.append(tanh_normal_mean(mean, scale, bias))
            elif m in ("explore", "sample"):
                ret.append(tanh_normal_sample(self.make_rng("sample"), mean, std, scale, bias))
            elif m == "rsample-with-neg-logp":
                action, log_p = tanh_normal_rsample_with_log_prob(
                    self.make_rng("sample"), mean, std, scale, bias, self.epsilon
                )
                ret.extend([action, -log_p[..., None]])
            elif m == "std":
                ret.append(std)
            elif m == "log_std":
                ret.append(jnp.log(std))
            elif m == "dist":
                ret.append((mean, std))
            elif m == "entropy":
                ret.append(normal_entropy(std).sum(-1))
            else:
                raise KeyError(f"Unknown head mode part: {m}")
        return ret[0] if len(ret) == 1 else tuple(ret)


@REGRESSION.register_module()
class GaussianHead(ContinuousHeadBase):
    """Unsquashed Gaussian with tanh-bounded mean (reference gaussian.py:91)."""

    predict_std: bool = True
    init_log_std: float = -0.5
    log_std_bound: Sequence[float] = (-20.0, 2.0)
    clip_return: bool = True

    @property
    def dim_feature(self) -> int:
        return self.dim_output * (2 if self.predict_std else 1)

    @nn.compact
    def __call__(self, feature, mode: str = "explore"):
        if self.predict_std:
            mean, log_std = jnp.split(feature, 2, axis=-1)
        else:
            mean = feature
            log_std = self.param("log_std", lambda k, s: jnp.full(s, self.init_log_std), (1, self.dim_output))
            log_std = jnp.broadcast_to(log_std, mean.shape)
        log_std = jnp.clip(log_std, self.log_std_bound[0], self.log_std_bound[1])
        std = jnp.exp(log_std)
        bounds, scale, bias = self._bounds()
        if bounds is not None:
            mean = jnp.tanh(mean)
        loc = mean * scale + bias
        parts = ["rsample-with-neg-logp"] if mode == "max-entropy" else mode.split("_")
        ret = []
        for m in parts:
            if m in ("mean", "eval"):
                ret.append(self.clamp(loc))
            elif m in ("explore", "sample"):
                ret.append(self.clamp(scaled_normal_rsample(self.make_rng("sample"), mean, std, scale, bias)))
            elif m == "rsample-with-neg-logp":
                action, log_p = scaled_normal_rsample_with_log_prob(self.make_rng("sample"), mean, std, scale, bias)
                ret.extend([action, -log_p[..., None]])
            elif m == "std":
                ret.append(std * scale)
            elif m == "log_std":
                ret.append(jnp.log(std * scale))
            elif m == "dist":
                ret.append((loc, std * scale))
            elif m == "entropy":
                ret.append(normal_entropy(std * scale).sum(-1))
            else:
                raise KeyError(f"Unknown head mode part: {m}")
        return ret[0] if len(ret) == 1 else tuple(ret)


@REGRESSION.register_module()
class SoftplusGaussianHead(ContinuousHeadBase):
    """PETS-style Gaussian with learned soft log-variance bounds
    (reference gaussian.py:113-131): log_var is softly clamped between two
    trainable per-dim bounds via softplus from both sides."""

    predict_std: bool = True
    init_log_std: float = -0.5
    log_std_bound: Sequence[float] = (-20.0, 2.0)
    init_log_var_min: float = -1.0
    init_log_var_max: float = 0.5

    @nn.compact
    def __call__(self, feature, mode: str = "explore"):
        assert self.predict_std and feature.shape[-1] == 2 * self.dim_output
        mean, log_std = jnp.split(feature, 2, axis=-1)
        log_std = jnp.clip(log_std, self.log_std_bound[0], self.log_std_bound[1])
        log_var_min = self.param("log_var_min", lambda k, s: jnp.full(s, self.init_log_var_min), (1, self.dim_output))
        log_var_max = self.param("log_var_max", lambda k, s: jnp.full(s, self.init_log_var_max), (1, self.dim_output))
        log_var = 2.0 * log_std
        log_var = log_var_max - jax.nn.softplus(log_var_max - log_var)
        log_var = log_var_min + jax.nn.softplus(log_var - log_var_min)
        std = jnp.exp(log_var / 2.0)
        _, scale, bias = self._bounds()
        loc = mean * scale + bias
        parts = ["rsample-with-neg-logp"] if mode == "max-entropy" else mode.split("_")
        ret = []
        for m in parts:
            if m in ("mean", "eval"):
                ret.append(self.clamp(loc))
            elif m in ("explore", "sample"):
                ret.append(self.clamp(scaled_normal_rsample(self.make_rng("sample"), mean, std, scale, bias)))
            elif m == "rsample-with-neg-logp":
                action, log_p = scaled_normal_rsample_with_log_prob(self.make_rng("sample"), mean, std, scale, bias)
                ret.extend([action, -log_p[..., None]])
            elif m == "std":
                ret.append(std * scale)
            elif m == "dist":
                ret.append((loc, std * scale))
            elif m == "entropy":
                ret.append(normal_entropy(std * scale).sum(-1))
            else:
                raise KeyError(f"Unknown head mode part: {m}")
        return ret[0] if len(ret) == 1 else tuple(ret)


@REGRESSION.register_module()
class BasicHead(ContinuousHeadBase):
    """Deterministic pass-through head (reference deterministic.py:60)."""

    @nn.compact
    def __call__(self, feature, mode: str = "eval"):
        return self.clamp(feature)


@REGRESSION.register_module()
class TanhHead(ContinuousHeadBase):
    """Deterministic tanh-squashed head (reference deterministic.py:68)."""

    @nn.compact
    def __call__(self, feature, mode: str = "eval"):
        _, scale, bias = self._bounds()
        return jnp.tanh(feature) * scale + bias


@REGRESSION.register_module()
class DiscreteBaseHead(nn.Module):
    """Categorical policy head over logits (reference regression_base.py:78).

    ``max-entropy`` returns (probs, entropy[..., None]) — the discrete-SAC
    contract used by the SAC update (sac.py:120,175-179).
    """

    num_choices: int
    num_heads: int = 1

    @nn.compact
    def __call__(self, feature, mode: str = "explore"):
        assert feature.shape[-1] == self.num_choices * self.num_heads
        logits = feature
        greedy = jnp.argmax(logits, axis=-1, keepdims=True)
        parts = ["p", "entropy"] if mode == "max-entropy" else mode.split("_")
        ret = []
        for m in parts:
            if m in ("mean", "eval", "greedy"):
                ret.append(greedy)
            elif m in ("explore", "sample"):
                ret.append(categorical_sample(self.make_rng("sample"), logits)[..., None])
            elif m in ("prob", "p"):
                ret.append(categorical_probs(logits))
            elif m == "entropy":
                ret.append(categorical_entropy(logits)[..., None])
            elif m in ("feature", "logits"):
                ret.append(logits)
            else:
                raise KeyError(f"Unknown head mode part: {m}")
        return ret[0] if len(ret) == 1 else tuple(ret)
