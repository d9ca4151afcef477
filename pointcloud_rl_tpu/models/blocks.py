"""Dense/MLP building blocks as flax modules.

Replaces the reference's mmcv-style ConvModule/LinearModule stacks
(reference ``pyrl/networks/backbones/mlp.py`` and
``pyrl/networks/modules/block_utils.py``) with a single channel-last MLP:
on TPU, a 1x1 Conv1d over ``[B, C, N]`` is exactly a Dense over
``[B, N, C]``, so ``LinearMLP`` and ``ConvMLP`` share one implementation
that maps onto the MXU as a plain batched matmul.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from . import NETWORK
from .init import make_torch_bias_init, torch_default_kernel_init


def get_activation(act_cfg) -> Optional[Callable]:
    if act_cfg is None:
        return None
    from collections.abc import Mapping

    name = act_cfg["type"] if isinstance(act_cfg, Mapping) else act_cfg
    table = {
        "ReLU": nn.relu,
        "GELU": nn.gelu,
        "SiLU": nn.silu,
        "Tanh": jnp.tanh,
        "Sigmoid": nn.sigmoid,
        "ELU": nn.elu,
        "LeakyReLU": lambda x: nn.leaky_relu(x, negative_slope=0.01),
        "Softplus": nn.softplus,
        "Identity": lambda x: x,
    }
    if name not in table:
        raise KeyError(f"Unknown activation {name}")
    return table[name]


def norm_kind_and_eps(norm_cfg) -> Tuple[Optional[str], float]:
    """Normalize norm configs: LN/LN1d/LN2d/LN3d all mean LayerNorm over channels.

    The reference's channel-first LNkD variants (nn_layer.py:191-237) exist only
    because torch conv layouts are channel-first; in channel-last JAX they all
    collapse to LayerNorm over the trailing feature axis.
    """
    if norm_cfg is None:
        return None, 1e-5
    from collections.abc import Mapping

    is_map = isinstance(norm_cfg, Mapping)
    kind = norm_cfg["type"] if is_map else norm_cfg
    eps = norm_cfg.get("eps", 1e-5) if is_map else 1e-5
    if kind.startswith("LN"):
        return "LN", eps
    if kind.startswith("BN") or kind in ("SyncBN",):
        # BatchNorm needs mutable batch stats; the shipped point-cloud configs
        # use LayerNorm everywhere, so BN maps to LN (documented deviation).
        return "LN", eps
    raise KeyError(f"Unknown norm type {kind}")


def resolve_dtype(dtype):
    """Accept None / "bfloat16" / "float32" / jnp dtypes (configs carry
    strings).  None means f32 (flax default promotion)."""
    if dtype is None or dtype == "float32":
        return None
    if dtype == "bfloat16":
        return jnp.bfloat16
    return dtype


class DenseBlock(nn.Module):
    """Dense -> [LayerNorm] -> [activation], channel-last.

    ``dtype`` is the MATMUL compute dtype (mixed precision): params stay
    f32 (flax param_dtype default), the Dense computes in bf16 on the MXU,
    and LayerNorm statistics/outputs are pinned to f32 — the reference's
    numerics live in the norm and the losses, the FLOPs live in the matmul.
    """

    out_channels: int
    norm: Optional[str] = "LN"
    norm_eps: float = 1e-5
    act: Optional[str] = "ReLU"
    use_bias: bool = True
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        cdtype = resolve_dtype(self.dtype)
        x = nn.Dense(
            self.out_channels,
            use_bias=self.use_bias,
            kernel_init=torch_default_kernel_init,
            bias_init=make_torch_bias_init(fan_in),
            dtype=cdtype,
        )(x)
        if self.norm == "LN":
            # LN statistics AND output in f32 even under mixed precision:
            # casting the normalized activations to bf16 bought no measured
            # bandwidth (XLA already fuses the casts) and measurably hurt
            # cartpole_swingup convergence (train reward 165 vs 250 @16k)
            x = nn.LayerNorm(epsilon=self.norm_eps, dtype=jnp.float32)(x)
        act = get_activation(self.act)
        if act is not None:
            x = act(x)
        return x


@NETWORK.register_module()
class MLP(nn.Module):
    """Configurable MLP over the trailing axis (works on [B, D] and [B, N, D]).

    Mirrors reference MLP semantics (mlp.py:15-94): ``inactivated_output``
    drops norm+act on the last layer; ``ignore_first_ln`` drops the norm on
    the first layer; ``zero_out_indices`` re-initializes the given slice of
    the last layer's output rows near zero (log-std trick,
    https://arxiv.org/pdf/2005.05719v1.pdf fig 7.a).
    """

    mlp_spec: Sequence[int]
    norm_cfg: Optional[Any] = None
    act_cfg: Optional[Any] = "ReLU"
    bias: Union[str, bool] = "auto"
    inactivated_output: bool = True
    ignore_first_ln: bool = False
    zero_out_indices: Optional[Any] = None
    block_type: str = "Linear"  # accepted for config parity; no behavioral difference
    dtype: Optional[Any] = None  # matmul compute dtype (mixed precision)

    @nn.compact
    def __call__(self, x, actions=None):
        if actions is not None:
            x = jnp.concatenate([x, actions], axis=-1)
        spec = list(self.mlp_spec)
        assert x.shape[-1] == spec[0], f"MLP input dim {x.shape[-1]} != spec[0] {spec[0]}"
        norm_kind, eps = norm_kind_and_eps(self.norm_cfg)
        cdtype = resolve_dtype(self.dtype)
        n_layers = len(spec) - 1
        for i in range(n_layers):
            is_last = i == n_layers - 1
            norm_i = None if (is_last and self.inactivated_output) or (i == 0 and self.ignore_first_ln) else norm_kind
            act_i = None if (is_last and self.inactivated_output) else self.act_cfg
            use_bias = self.bias if isinstance(self.bias, bool) else True
            if is_last and self.zero_out_indices is not None:
                fan_in = spec[i]
                zidx = self.zero_out_indices

                def kinit(key, shape, dtype=jnp.float32, _f=fan_in, _z=zidx):
                    w = torch_default_kernel_init(key, shape, dtype)
                    small = jax.random.uniform(key, shape, dtype, -1e-3, 1e-3)
                    # flax kernel is [in, out]: zero-out selects output columns
                    return w.at[:, _z].set(small[:, _z])

                def binit(key, shape, dtype=jnp.float32, _f=fan_in, _z=zidx):
                    b = make_torch_bias_init(_f)(key, shape, dtype)
                    small = jax.random.uniform(key, shape, dtype, -1e-3, 1e-3)
                    return b.at[_z].set(small[_z])

                x = nn.Dense(spec[i + 1], use_bias=use_bias, kernel_init=kinit, bias_init=binit,
                             dtype=cdtype)(x)
            else:
                x = nn.Dense(
                    spec[i + 1],
                    use_bias=use_bias,
                    kernel_init=torch_default_kernel_init,
                    bias_init=make_torch_bias_init(spec[i]),
                    dtype=cdtype,
                )(x)
            if norm_i == "LN":
                x = nn.LayerNorm(epsilon=eps, dtype=jnp.float32)(x)
            act = get_activation(act_i)
            if act is not None:
                x = act(x)
        # Heads/losses stay f32: cast the (possibly bf16) last-layer output up.
        return x.astype(jnp.float32) if cdtype is not None else x


@NETWORK.register_module()
class LinearMLP(MLP):
    """Alias of MLP on [B, D] features (reference mlp.py:98)."""


@NETWORK.register_module()
class ConvMLP(MLP):
    """Per-point shared MLP: reference's 1x1 Conv1d stack over [B, C, N]
    (mlp.py:104) expressed channel-last as Dense over [B, N, C]."""


def scale_gradient(x, scale: float):
    """Identity with gradient scaled by ``scale`` (reference avg_grad, ops.py:128)."""
    return x * scale + jax.lax.stop_gradient(x * (1.0 - scale))
