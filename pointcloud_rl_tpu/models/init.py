"""Weight initializers.

``torch_default`` reproduces torch.nn.Linear/Conv default init (uniform
±1/sqrt(fan_in) for both kernel and bias) so that learning dynamics match the
reference closely; ``delta_orthogonal`` mirrors the reference's
delta-orthogonal conv init (reference ``pyrl/networks/modules/weight_init.py:66``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def torch_default_kernel_init(key, shape, dtype=jnp.float32):
    """U(-1/sqrt(fan_in), 1/sqrt(fan_in)); flax kernels are [..., in, out]."""
    fan_in = int(np.prod(shape[:-1]))
    bound = 1.0 / np.sqrt(max(fan_in, 1))
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def make_torch_bias_init(fan_in: int):
    bound = 1.0 / np.sqrt(max(fan_in, 1))

    def _init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return _init


def orthogonal_init(gain: float = 1.0):
    return jax.nn.initializers.orthogonal(scale=gain)


def delta_orthogonal_init(gain: float = 1.0):
    """Delta-orthogonal init for square conv kernels (3x3/5x5/7x7).

    Central spatial tap carries an orthogonal matrix; all other taps are zero.
    """

    ortho = jax.nn.initializers.orthogonal(scale=gain)

    def _init(key, shape, dtype=jnp.float32):
        # flax conv kernel: [kh, kw, in, out]
        if len(shape) == 2:
            return ortho(key, shape, dtype)
        assert len(shape) >= 3, f"delta_orthogonal expects conv kernel, got {shape}"
        weight = jnp.zeros(shape, dtype)
        mid = tuple(s // 2 for s in shape[:-2])
        mat = ortho(key, shape[-2:], dtype)
        return weight.at[mid + (slice(None), slice(None))].set(mat)

    return _init


def build_init(cfg):
    """Config-driven initializer factory (reference weight_init.py:112 role)."""
    if cfg is None:
        return None
    cfg = dict(cfg)
    kind = cfg.pop("type")
    if kind in ("orthogonal", "orthogonal_init"):
        return orthogonal_init(cfg.get("gain", 1.0))
    if kind in ("delta_orthogonal", "delta_orthogonal_init"):
        return delta_orthogonal_init(cfg.get("gain", 1.0))
    if kind in ("torch_default",):
        return torch_default_kernel_init
    if kind in ("xavier_uniform", "xavier_init"):
        return jax.nn.initializers.xavier_uniform()
    raise KeyError(f"Unknown init type {kind}")
