"""Vector-Neurons PointNet (SO(3)-equivariant point encoder).

Parity target: the reference registers ``VNPointNet`` only in a config
(``configs/mfrl/sac/maniskill/vn.py`` — mlp_spec=[128, 128, 256],
out_channels=128, n_knn=4); the implementation is ABSENT from the reference
snapshot, so that config cannot run there (SURVEY.md §2.3 "config-referenced
but absent").  This module makes it runnable: a faithful Vector Neurons
encoder (Deng et al., ICCV 2021 — "Vector Neurons: A General Framework for
SO(3)-Equivariant Networks") in the architecture the config describes: a
VN-DGCNN-style k-NN edge lift, VN linear/LeakyReLU layers over the
``mlp_spec`` vector-channel widths, an invariant-feature readout, and a
global max-pool to ``out_channels`` scalar features.

Design notes (TPU):
- Vector features are channel-last ``[B, N, C, 3]``; every VNLinear is a
  Dense over the C axis → a batched matmul on the MXU (the 3-axis rides
  along as a free minor dimension).
- The k-NN graph is built once from a full ``[B, N, N]`` distance matrix +
  ``lax.top_k`` — static shapes, no host round trip.  Fine at the config's
  1200-point clouds; this is the encoder a user opts into for equivariance,
  not the throughput flagship.
- Equivariance contract (unit-tested): rotating the input cloud leaves the
  output features unchanged (the readout is invariant); translation is
  removed by mean-centering.  Scalar point channels beyond xyz (rgb /
  pos_encoding / seg) are rotation-invariant already and join at the
  invariant readout.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from . import NETWORK
from .init import make_torch_bias_init, torch_default_kernel_init
from .pointnet import preprocess_pointcloud


class VNLinear(nn.Module):
    """Channel-mixing linear map on vector features: ``[.., C_in, 3] ->
    [.., C_out, 3]``.  No bias — adding a constant vector would break
    equivariance."""

    out_channels: int

    @nn.compact
    def __call__(self, x):
        x = jnp.swapaxes(x, -1, -2)  # [.., 3, C_in]
        x = nn.Dense(self.out_channels, use_bias=False,
                     kernel_init=torch_default_kernel_init)(x)
        return jnp.swapaxes(x, -1, -2)  # [.., C_out, 3]


class VNLeakyReLU(nn.Module):
    """Vector-Neurons LeakyReLU (Deng et al. §3.2): a learned per-channel
    direction d splits each feature vector's half-space; the negative
    half-space is projected onto the plane orthogonal to d, blended by the
    leaky slope."""

    negative_slope: float = 0.2

    @nn.compact
    def __call__(self, q):
        d = VNLinear(q.shape[-2])(q)  # learned directions, same channel count
        dot = jnp.sum(q * d, axis=-1, keepdims=True)
        d_sq = jnp.sum(d * d, axis=-1, keepdims=True)
        q_proj = q - (dot / (d_sq + 1e-8)) * d  # negative half-space projection
        alpha = self.negative_slope
        return alpha * q + (1.0 - alpha) * jnp.where(dot >= 0.0, q, q_proj)


class VNLayerNorm(nn.Module):
    """Direction-preserving normalization: RMS-normalize the vector NORMS
    across channels with a learnable per-channel gain.  The scale applied to
    each vector is strictly positive, so directions are untouched (a plain
    LayerNorm over norms can go negative and silently FLIP vectors), and the
    scale is a function of rotation invariants, so the map stays
    SO(3)-equivariant."""

    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):  # [.., C, 3]
        norms = jnp.linalg.norm(x, axis=-1)  # [.., C]
        rms = jnp.sqrt(jnp.mean(norms * norms, axis=-1, keepdims=True) + self.eps)
        gain = self.param("gain", nn.initializers.ones, (x.shape[-2],))
        scale = gain / (rms + self.eps)
        return x * scale[..., None]


class VNBlock(nn.Module):
    """VNLinear -> VNLayerNorm -> VNLeakyReLU."""

    out_channels: int
    use_norm: bool = True

    @nn.compact
    def __call__(self, x):
        x = VNLinear(self.out_channels)(x)
        if self.use_norm:
            x = VNLayerNorm()(x)
        return VNLeakyReLU()(x)


def knn_indices(xyz: jnp.ndarray, k: int) -> jnp.ndarray:
    """k nearest neighbours (excluding self) from a dense distance matrix.

    xyz: [B, N, 3] -> [B, N, k] int32.  Static shapes; ``lax.top_k`` over
    the negated squared distances.
    """
    sq = jnp.sum(xyz * xyz, axis=-1)  # [B, N]
    d2 = sq[..., :, None] + sq[..., None, :] - 2.0 * jnp.einsum("bnd,bmd->bnm", xyz, xyz)
    n = xyz.shape[-2]
    d2 = d2 + jnp.eye(n, dtype=d2.dtype) * 1e9  # exclude self
    _, idx = jax.lax.top_k(-d2, k)
    return idx


@NETWORK.register_module()
class VNPointNet(nn.Module):
    """SO(3)-equivariant point encoder with an invariant global readout.

    feat_dim: total per-point input channels (``pcd_all_channel``); the
    first 3 are xyz (lifted to vector features), the rest are scalar
    channels that join at the invariant readout.
    """

    feat_dim: int
    mlp_spec: Sequence[int] = (128, 128, 256)
    out_channels: int = 128
    n_knn: int = 4
    norm_cfg: Optional[Any] = None  # config parity; VNLayerNorm is the only VN-safe norm here
    act_cfg: Any = "LeakyReLU"  # config parity; VNLeakyReLU is the VN activation
    dtype: Optional[Any] = None  # config parity; VN math stays f32 (norm/projection stability)

    @nn.compact
    def __call__(self, obs, **kwargs):
        feature = preprocess_pointcloud(obs)  # [B, N, C]
        feature = feature.astype(jnp.float32)
        xyz = feature[..., :3]
        extras = feature[..., 3:]  # rotation-invariant scalar channels

        center = jnp.mean(xyz, axis=-2, keepdims=True)
        xyz_c = xyz - center  # translation invariance

        # --- k-NN edge lift (VN-DGCNN §4.1): per point, its k edge vectors
        # and its own position form 2 vector channels per neighbour.
        idx = knn_indices(xyz_c, self.n_knn)  # [B, N, K]
        neigh = jax.vmap(lambda pts, i: pts[i])(xyz_c, idx)  # [B, N, K, 3]
        edges = neigh - xyz_c[..., None, :]  # [B, N, K, 3]
        point = jnp.broadcast_to(xyz_c[..., None, :], edges.shape)
        v = jnp.stack([edges, point], axis=-2)  # [B, N, K, 2, 3]

        spec = list(self.mlp_spec)
        v = VNBlock(spec[0])(v)  # [B, N, K, C0, 3]
        v = jnp.mean(v, axis=2)  # pool the neighbourhood -> [B, N, C0, 3]
        for width in spec[1:]:
            v = VNBlock(width)(v)  # pointwise VN layers

        # --- invariant readout (VNStdFeature): inner products of the
        # feature vectors against a learned equivariant frame.  <R u, R t>
        # = <u, t> for any rotation R, so ``inv`` is rotation-invariant.
        frame = VNBlock(3, use_norm=False)(v)  # [B, N, 3, 3] equivariant directions
        inv = jnp.einsum("bncd,bnkd->bnck", v, frame)  # [B, N, C_last, 3]
        inv = inv.reshape(inv.shape[:2] + (-1,))  # [B, N, 3*C_last]
        if extras.shape[-1] > 0:
            inv = jnp.concatenate([inv, extras], axis=-1)

        x = nn.Dense(self.out_channels,
                     kernel_init=torch_default_kernel_init,
                     bias_init=make_torch_bias_init(inv.shape[-1]))(inv)
        x = jnp.max(x, axis=-2)  # symmetric pool over points
        return nn.LayerNorm()(x)
