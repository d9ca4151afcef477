"""2D CNN encoders: NatureCNN, DMCEncoder (SAC-AE), IMPALA.

Parity target: reference ``pyrl/networks/backbones/cnn.py``.  Observations
arrive channel-first ``[B, C, H, W]`` (env contract); we transpose once to
NHWC, XLA's native TPU conv layout.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from . import NETWORK
from .blocks import get_activation, norm_kind_and_eps
from .init import make_torch_bias_init, torch_default_kernel_init


def preprocess_images(obs) -> jnp.ndarray:
    """Concat rgb/255 + depth + xyz + seg channel-wise, output NHWC.

    Mirrors CNNBase.preprocess (cnn.py:25-48) with a layout change to NHWC.
    """
    if isinstance(obs, dict):
        feats = []
        if "rgb" in obs:
            rgb = jnp.asarray(obs["rgb"])
            rgb = rgb.astype(jnp.float32) / 255.0 if rgb.dtype == jnp.uint8 else rgb.astype(jnp.float32)
            feats.append(rgb)
        for key in ("depth", "xyz", "seg"):
            if key in obs:
                feats.append(jnp.asarray(obs[key], jnp.float32))
        x = jnp.concatenate(feats, axis=-3)
    else:
        x = jnp.asarray(obs)
        x = x.astype(jnp.float32) / 255.0 if x.dtype == jnp.uint8 else x.astype(jnp.float32)
    return jnp.moveaxis(x, -3, -1)  # NCHW -> NHWC


def _conv(out_ch: int, kernel: int, stride: int, padding: int = 0, in_ch: Optional[int] = None):
    fan_in = (in_ch or 1) * kernel * kernel
    return nn.Conv(
        out_ch,
        (kernel, kernel),
        strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        kernel_init=torch_default_kernel_init,
        bias_init=make_torch_bias_init(fan_in),
    )


@NETWORK.register_module()
class NatureCNN(nn.Module):
    """DQN-style configurable conv stack + flatten + Linear (cnn.py:135-205)."""

    in_channels: int
    image_size: Sequence[int]
    out_channels: Optional[int] = 512
    mlp_spec: Sequence[int] = (32, 64, 64)
    kernel_size: Sequence[int] = (8, 4, 2)
    stride: Sequence[int] = (4, 2, 1)
    padding: Optional[Sequence[int]] = None
    norm_cfg: Optional[Any] = None
    act_cfg: Any = "ReLU"
    ignore_first_ln: bool = True
    flatten: bool = True
    inactivate_output: bool = False
    conv_init_cfg: Optional[Any] = None

    @nn.compact
    def __call__(self, obs, **kwargs):
        x = preprocess_images(obs)
        act = get_activation(self.act_cfg)
        norm_kind, eps = norm_kind_and_eps(self.norm_cfg)
        padding = self.padding or [0] * len(self.kernel_size)
        n = len(self.mlp_spec)
        in_ch = self.in_channels
        for i in range(n):
            x = _conv(self.mlp_spec[i], self.kernel_size[i], self.stride[i], padding[i], in_ch)(x)
            in_ch = self.mlp_spec[i]
            use_norm = norm_kind == "LN" and not (i == 0 and self.ignore_first_ln)
            if use_norm:
                x = nn.LayerNorm(epsilon=eps)(x)
            last_conv = i == n - 1
            if not (last_conv and self.inactivate_output and self.out_channels is None) and act is not None:
                x = act(x)
        if self.flatten or self.out_channels is not None:
            x = x.reshape(x.shape[0], -1)
        if self.out_channels is not None:
            x = nn.Dense(self.out_channels, kernel_init=torch_default_kernel_init,
                         bias_init=make_torch_bias_init(x.shape[-1]))(x)
            if not self.inactivate_output and act is not None:
                x = act(x)
        return x


@NETWORK.register_module()
class DMCEncoder(nn.Module):
    """SAC-AE encoder for DM Control (cnn.py:209-223): 4 conv(32, k3),
    stride [2,1,1,1], flatten, Linear(out) + LayerNorm, no output activation.

    ``conv_init_cfg`` (e.g. delta_orthogonal_init, gain 1.414) overrides the
    conv kernel init; ``norm_cfg`` (LN2d) adds LayerNorm after each conv."""

    in_channels: int
    image_size: Sequence[int]
    out_channels: int = 50
    mlp_spec: Sequence[int] = (32, 32, 32, 32)
    kernel_size: Sequence[int] = (3, 3, 3, 3)
    stride: Sequence[int] = (2, 1, 1, 1)
    act_cfg: Any = "ReLU"
    norm_cfg: Optional[Any] = None
    conv_init_cfg: Optional[Any] = None

    @nn.compact
    def __call__(self, obs, **kwargs):
        from .init import build_init

        x = preprocess_images(obs)
        act = get_activation(self.act_cfg)
        norm_kind, eps = norm_kind_and_eps(self.norm_cfg)
        conv_init = build_init(dict(self.conv_init_cfg)) if self.conv_init_cfg is not None else None
        in_ch = self.in_channels
        for ch, k, s in zip(self.mlp_spec, self.kernel_size, self.stride):
            conv = nn.Conv(
                ch, (k, k), strides=(s, s), padding=[(0, 0), (0, 0)],
                kernel_init=conv_init or torch_default_kernel_init,
                bias_init=make_torch_bias_init(in_ch * k * k),
            )
            x = conv(x)
            in_ch = ch
            if norm_kind == "LN":
                x = nn.LayerNorm(epsilon=eps)(x)
            x = act(x)
        x = x.reshape(x.shape[0], -1)
        x = nn.Dense(self.out_channels, kernel_init=torch_default_kernel_init,
                     bias_init=make_torch_bias_init(x.shape[-1]))(x)
        x = nn.LayerNorm()(x)
        return x


class _ImpalaBlock(nn.Module):
    channels: int

    @nn.compact
    def __call__(self, x):
        y = nn.relu(x)
        y = _conv(self.channels, 3, 1, 1, x.shape[-1])(y)
        y = nn.relu(y)
        y = _conv(self.channels, 3, 1, 1, self.channels)(y)
        return x + y


@NETWORK.register_module()
class IMPALA(nn.Module):
    """IMPALA resnet encoder (cnn.py:52-132): 4x4/s4 stem, then per stage
    conv3 + maxpool/2 + two residual blocks; ReLU -> flatten -> fc."""

    in_channel: int
    num_pixels: int
    out_feature_size: int = 256
    out_channel: Optional[int] = None

    @nn.compact
    def __call__(self, obs, **kwargs):
        x = preprocess_images(obs)
        fcs = (64, 64, 64)
        x = _conv(fcs[0], 4, 4, 0, self.in_channel)(x)
        for ch in fcs:
            x = _conv(ch, 3, 1, 1, x.shape[-1])(x)
            x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
            x = _ImpalaBlock(ch)(x)
            x = _ImpalaBlock(ch)(x)
        x = nn.relu(x)
        x = x.reshape(x.shape[0], -1)
        x = nn.relu(nn.Dense(self.out_feature_size, kernel_init=torch_default_kernel_init,
                             bias_init=make_torch_bias_init(x.shape[-1]))(x))
        if self.out_channel is not None:
            x = nn.Dense(self.out_channel, kernel_init=torch_default_kernel_init,
                         bias_init=make_torch_bias_init(x.shape[-1]))(x)
        return x
