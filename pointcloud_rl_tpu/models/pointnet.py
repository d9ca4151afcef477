"""PointNet encoder, TPU-layout.

Parity target: reference ``pyrl/networks/backbones/pointnet.py`` — per-point
shared MLP over concat(xyz, rgb/255, pos_encoding, seg) followed by a global
max-pool and a Linear+LayerNorm projection, with optional STN input/feature
transforms (feature_transform=[1]/[2]; the shipped RL configs use []).

Layout: observations arrive channel-first ``[B, C, N]`` (env contract); we
transpose once to channel-last ``[B, N, C]`` so every per-point layer is a
plain Dense batched matmul tiled onto the MXU, and the symmetric max is a
lane-wise reduction.  The preprocess + first dense layer can be fused in
Pallas (ops/pointnet_fused.py) — this module is the reference XLA path.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from . import NETWORK
from .blocks import MLP
from .init import make_torch_bias_init, torch_default_kernel_init


def position_embedding(feature_dim: int, num_embedding: int) -> np.ndarray:
    """Sinusoidal embedding table (reference pointnet.py:20-27)."""
    assert feature_dim % 2 == 0
    position = np.arange(num_embedding)[:, None].astype(np.float32)
    div_term = np.exp(np.arange(0, feature_dim, 2, dtype=np.float32) * -(math.log(10000.0) / feature_dim))
    emb = np.zeros((num_embedding, feature_dim), np.float32)
    emb[:, 0::2] = np.sin(position * div_term)
    emb[:, 1::2] = np.cos(position * div_term)
    return emb


def preprocess_pointcloud(obs) -> jnp.ndarray:
    """Assemble the per-point feature tensor, channel-LAST ``[B, N, C]``.

    Mirrors PointCloudBase.preprocess (pointnet.py:49-73): channel order is
    xyz, rgb/255, pos_encoding, seg.  Inputs are the env's channel-first
    ``[B, C, N]`` leaves (or already a plain array).
    """
    if not isinstance(obs, dict):
        x = jnp.asarray(obs, jnp.float32)
        return jnp.swapaxes(x, -1, -2)
    if "pcd" in obs:
        # Pre-glued model-input tensor (replay pack_features mode,
        # algorithms/obs_transfer.pack_device_features): already channel-last
        # and already in the matmul compute dtype — pass through untouched.
        return jnp.asarray(obs["pcd"])
    feats = [jnp.asarray(obs["xyz"], jnp.float32)]
    if "rgb" in obs:
        rgb = jnp.asarray(obs["rgb"])
        rgb = rgb.astype(jnp.float32) / 255.0 if rgb.dtype == jnp.uint8 else rgb.astype(jnp.float32)
        feats.append(rgb)
    for key in ("pos_encoding", "seg"):
        if key in obs:
            feats.append(jnp.asarray(obs[key], jnp.float32))
    feature = jnp.concatenate(feats, axis=-2)  # channel-first concat
    return jnp.swapaxes(feature, -1, -2)  # -> [B, N, C]


class STNkd(nn.Module):
    """Spatial transformer predicting a k x k alignment matrix
    (reference pointnet.py:30-45)."""

    k: int = 3
    mlp_spec: Sequence[int] = (64, 128, 1024)
    norm_cfg: Optional[Any] = None
    act_cfg: Any = "ReLU"
    ignore_first_ln: bool = True

    @nn.compact
    def __call__(self, points):  # [B, N, k]
        spec = list(self.mlp_spec)
        x = MLP(
            [self.k] + spec,
            norm_cfg=self.norm_cfg,
            act_cfg=self.act_cfg,
            inactivated_output=False,
            ignore_first_ln=self.ignore_first_ln,
        )(points)
        x = x.max(axis=-2)  # pool over points
        head_spec = [spec[-1] // 2**i for i in range(len(spec))] + [self.k * self.k]
        x = MLP(head_spec, norm_cfg=self.norm_cfg, act_cfg=self.act_cfg, inactivated_output=True)(x)
        x = x.reshape(x.shape[:-1] + (self.k, self.k))
        return jnp.eye(self.k, dtype=x.dtype) + x


@NETWORK.register_module()
class PointNet(nn.Module):
    """Per-point MLP + symmetric max-pool encoder (reference pointnet.py:77).

    feat_dim: total per-point input channels (resolved from the
    ``pcd_all_channel`` placeholder); out_channels: final projected feature.
    """

    feat_dim: int
    mlp_spec: Sequence[int] = (64, 128, 1024)
    out_channels: Optional[int] = None
    global_feat: bool = True
    feature_transform: Sequence[int] = (1,)
    norm_cfg: Optional[Any] = None
    act_cfg: Any = "ReLU"
    ignore_first_ln: bool = False
    num_patch: int = 1  # config parity; unused
    fused: bool = False  # Pallas fused body (ops/pointnet_fused.py)
    dtype: Optional[Any] = None  # matmul compute dtype (mixed precision)

    def _fused_supported(self) -> bool:
        return (
            self.fused
            and len(self.mlp_spec) == 3
            and not self.feature_transform
            and self.ignore_first_ln
            and self.global_feat
            and (self.act_cfg in ("ReLU", {"type": "ReLU"}) or getattr(self.act_cfg, "get", lambda *_: None)("type") == "ReLU")
        )

    def setup(self):
        # ONE canonical param tree regardless of the fused flag: the Pallas
        # body is a compute-path swap that reads the unfused ``conv`` MLP's
        # params (weight tying via child .variables), so checkpoints are
        # portable between fused=True/False — flipping the kernel never
        # invalidates a training run.
        self._setup_unfused()

    def _setup_unfused(self):
        default_norm = {"type": "LN", "eps": 1e-6}
        norm = self.norm_cfg if self.norm_cfg is not None else default_norm
        self._norm = norm
        spec = list(self.mlp_spec)
        if 1 in self.feature_transform:
            self.stn = STNkd(3, spec, norm_cfg=norm, act_cfg=self.act_cfg, ignore_first_ln=self.ignore_first_ln)
        if 2 in self.feature_transform:
            self.conv1 = MLP([self.feat_dim, spec[0]], norm_cfg=norm, act_cfg=self.act_cfg,
                             inactivated_output=False, ignore_first_ln=self.ignore_first_ln)
            self.fstn = STNkd(spec[0], spec, norm_cfg=norm, act_cfg=self.act_cfg,
                              ignore_first_ln=self.ignore_first_ln)
            self.conv2 = MLP(spec, norm_cfg=norm, act_cfg=self.act_cfg, inactivated_output=False)
        else:
            self.conv = MLP([self.feat_dim] + spec, norm_cfg=norm, act_cfg=self.act_cfg,
                            inactivated_output=False, ignore_first_ln=self.ignore_first_ln,
                            dtype=self.dtype)
        if self.out_channels is not None:
            from .blocks import resolve_dtype

            self.final_dense = nn.Dense(
                self.out_channels,
                kernel_init=torch_default_kernel_init,
                bias_init=make_torch_bias_init(list(self.mlp_spec)[-1]),
                dtype=resolve_dtype(self.dtype),
            )
            self.final_ln = nn.LayerNorm(dtype=jnp.float32)

    def __call__(self, obs, **kwargs):
        feature = preprocess_pointcloud(obs)  # [B, N, C]
        if self._fused_supported() and not self.is_initializing():
            # During init the unfused path below runs instead, creating the
            # canonical conv/Dense_i + LayerNorm_i params this branch reads.
            from ..ops.pointnet_fused import fused_pointnet_body
            from .blocks import resolve_dtype

            p = self.conv.variables["params"]
            params = (p["Dense_0"]["kernel"], p["Dense_0"]["bias"],
                      p["Dense_1"]["kernel"], p["Dense_1"]["bias"],
                      p["LayerNorm_0"]["scale"], p["LayerNorm_0"]["bias"],
                      p["Dense_2"]["kernel"], p["Dense_2"]["bias"],
                      p["LayerNorm_1"]["scale"], p["LayerNorm_1"]["bias"])
            # No dtype cast here: f32 input stays f32 (the kernel casts to
            # the compute dtype at its matmul input), and a pre-packed bf16
            # tensor enters as-is — upcasting it to f32 first would just add
            # two full HBM passes over [B, N, C].
            pooled = fused_pointnet_body(feature, params, 512, 8,
                                         resolve_dtype(self.dtype))
            if self.out_channels is not None:
                pooled = self.final_ln(self.final_dense(pooled))
            return pooled
        if 1 in self.feature_transform:
            xyz = feature[..., :3]
            trans = self.stn(xyz)
            xyz = jnp.einsum("...ni,...ij->...nj", xyz, trans)
            feature = jnp.concatenate([xyz, feature[..., 3:]], axis=-1)
        if 2 in self.feature_transform:
            feature = self.conv1(feature)
            trans = self.fstn(feature)
            feature = jnp.einsum("...ni,...ij->...nj", feature, trans)
            feature = self.conv2(feature)
        else:
            feature = self.conv(feature)
        if self.global_feat:
            feature = feature.max(axis=-2)
            if self.out_channels is not None:
                feature = self.final_ln(self.final_dense(feature))
        else:
            raise NotImplementedError("Only global_feat=True is supported (parity with reference)")
        return feature
