"""Observation transfer spec: shrink host->device obs payloads.

TPU-native data-plane optimization (no reference counterpart — the
reference's CUDA pipeline pays a PCIe copy per batch and never thinks
about it, SURVEY.md §2.7): on a tunneled/remote TPU every byte of the act
dispatch rides the relay, and every byte of a replay push shares the same
link, so obs payload size directly taxes the action-fetch latency that
bounds combined throughput (see bench.py's relay accounting).

Two independent reductions, both opt-in via ``agent_cfg.obs_transfer_cfg``:

1. ``pos_encoding_on_device``: the FrameStack wrapper's ``pos_encoding``
   channel block (env/api.py:199-227, reference wrappers.py:242-270) is a
   CONSTANT one-hot frame index — eye(F) repeated over each frame's points.
   Uploading it with every act dispatch and storing it per transition in
   HBM replay is pure waste.  Instead the host drops the block and the
   jitted programs re-synthesize it on device (bitwise identical values,
   so this path is EXACT — no numerics deviation).
2. ``pack_dtype``: pack the act-path upload in float16 (xyz at mm-scale
   precision; rgb in [0,1] at 1e-3) and cast back to float32 on device.
   Quantizes inference inputs only when set — training batches follow the
   replay's own ``transfer_cfg`` dtype map.

The update path completes obs dicts by KEY PRESENCE at trace time: batches
whose ``obs`` lack ``pos_encoding`` (device replay configured with
``drop_subkeys``) get the synthesized block inserted before any
augmentation, preserving the reference channel order
xyz, rgb, pos_encoding, seg (pyrl pointnet.py:49-73) exactly.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional

import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class ObsTransferSpec:
    pos_rows: int  # F: pos_encoding channel count == stacked frame count
    insert_at: int  # channel offset of the block in the packed layout
    points_per_frame: int  # N // F (frame-major point ordering)
    drop_pos_encoding: bool = True
    pack_dtype: Optional[Any] = None  # e.g. np.float16 for the act upload
    # "packed": host-assembled single float array (one upload, widest wire);
    # "dict": ship the env's native leaves (xyz f32 + rgb uint8 — EXACT and
    # ~40% narrower than the f32 pack; two uploads instead of one).
    pack_mode: str = "packed"
    # channel count of the REDUCED pack (all blocks minus pos_encoding) —
    # lets complete_packed distinguish a stripped pack from an already-full
    # one instead of blindly inserting a second block.
    packed_channels: int = 0


def make_obs_transfer(cfg: Optional[dict], obs_shape) -> Optional[ObsTransferSpec]:
    """Build the spec from the agent config + env obs shapes (run_rl's
    env probe).  Returns None when disabled or the obs carry no
    pos_encoding (nothing to drop)."""
    if not cfg:
        return None
    cfg = dict(cfg)
    drop = bool(cfg.pop("pos_encoding_on_device", True))
    pack_dtype = cfg.pop("pack_dtype", None)
    pack_mode = cfg.pop("pack_mode", "packed")
    assert pack_mode in ("packed", "dict"), f"unknown pack_mode: {pack_mode}"
    assert not cfg, f"unknown obs_transfer_cfg keys: {sorted(cfg)}"
    if pack_dtype is not None:
        pack_dtype = np.dtype(pack_dtype)
    if not (isinstance(obs_shape, dict) and "pos_encoding" in obs_shape):
        drop = False
        if pack_dtype is None and pack_mode == "packed":
            return None
        return ObsTransferSpec(0, 0, 0, drop_pos_encoding=False, pack_dtype=pack_dtype,
                               pack_mode=pack_mode)
    rows, n = (int(s) for s in obs_shape["pos_encoding"])
    assert n % rows == 0, f"pos_encoding {rows}x{n}: N not divisible by frames"
    insert_at = int(obs_shape["xyz"][0]) + (int(obs_shape["rgb"][0]) if "rgb" in obs_shape else 0)
    packed_channels = sum(int(obs_shape[k][0]) for k in ("xyz", "rgb", "seg") if k in obs_shape)
    return ObsTransferSpec(rows, insert_at, n // rows, drop_pos_encoding=drop,
                           pack_dtype=pack_dtype, pack_mode=pack_mode,
                           packed_channels=packed_channels)


def synth_pos_encoding(rows: int, points_per_frame: int, dtype=jnp.float32) -> jnp.ndarray:
    """[rows, rows*points_per_frame] one-hot block == FrameStack's
    ``np.repeat(np.eye(F), num_points, axis=-1)`` (env/api.py:215)."""
    return jnp.repeat(jnp.eye(rows, dtype=dtype), points_per_frame, axis=-1)


def complete_packed(x: jnp.ndarray, spec: ObsTransferSpec) -> jnp.ndarray:
    """Insert the synthesized block into a packed [..., C, N] act upload and
    cast to float32.  No-op (cast only) when the block wasn't dropped or the
    array already carries the full channel set (trace-time shape check)."""
    x = x.astype(jnp.float32)
    if not spec.drop_pos_encoding:
        return x
    channels = x.shape[-2]
    if channels == spec.packed_channels + spec.pos_rows:
        return x  # already complete (e.g. a pre-packed full obs array)
    assert channels == spec.packed_channels, (
        f"packed obs carries {channels} channels; expected the reduced "
        f"{spec.packed_channels} (stripped) or {spec.packed_channels + spec.pos_rows} (full)"
    )
    pe = synth_pos_encoding(spec.pos_rows, spec.points_per_frame)
    pe = jnp.broadcast_to(pe, x.shape[:-2] + pe.shape)
    return jnp.concatenate([x[..., : spec.insert_at, :], pe, x[..., spec.insert_at :, :]], axis=-2)


def pack_device_features(obs: Dict[str, Any], dtype=jnp.bfloat16, synth_pos=None) -> Dict[str, Any]:
    """Glue a raw pointcloud obs dict into the MODEL-INPUT feature tensor,
    once, on device: ``{"pcd": [..., N, C] <dtype>, "state"?: f32}``.

    The per-update profile (tools/exp_update_profile.py, round 4) showed
    ~40% of the SAC update's device time was re-running convert / div-255 /
    broadcast / concat / transpose on [B, N, C]-scale tensors for BOTH obs
    and next_obs of every sampled batch.  Packing at replay-push time moves
    that work to once per TRANSITION instead of once per SAMPLE, and stores
    the tensor channel-LAST in the matmul compute dtype, so the update's obs
    prep collapses to a gather.

    Channel order matches ``preprocess_pointcloud`` (reference
    pyrl/networks/backbones/pointnet.py:49-73) exactly: xyz, rgb/255,
    pos_encoding, seg.  Numerics: identical to the default path for f32
    storage — both cast the same f32 values to bf16 exactly once (here at
    push; there at the kernel's matmul input).

    ``synth_pos=(rows, points_per_frame)``: re-synthesize the constant
    pos_encoding block on device when the pushed obs was stripped of it
    host-side (DeviceReplayMemory auto-drops it before upload — the block
    is ~30% of a push's relay payload for stacked DMC obs and bitwise
    reproducible from its shape alone).
    """
    feats = [jnp.asarray(obs["xyz"], jnp.float32)]
    if "rgb" in obs:
        rgb = jnp.asarray(obs["rgb"])
        rgb = rgb.astype(jnp.float32) / 255.0 if rgb.dtype == jnp.uint8 else rgb.astype(jnp.float32)
        feats.append(rgb)
    if "pos_encoding" not in obs and synth_pos is not None:
        rows, ppf = synth_pos
        pe = synth_pos_encoding(rows, ppf)
        feats.append(jnp.broadcast_to(pe, feats[0].shape[:-2] + pe.shape))
    for key in ("pos_encoding", "seg"):
        if key in obs:
            feats.append(jnp.asarray(obs[key], jnp.float32))
    pcd = jnp.swapaxes(jnp.concatenate(feats, axis=-2), -1, -2).astype(dtype)
    out = {"pcd": pcd}
    for key in ("state", "agent"):
        if key in obs:
            out[key] = jnp.asarray(obs[key], jnp.float32)
    return out


def complete_obs_dict(obs: Dict[str, Any], spec: ObsTransferSpec) -> Dict[str, Any]:
    """Re-attach ``pos_encoding`` to an obs dict whose copy was stripped for
    transfer/storage.  Key-presence check is trace-time (static)."""
    if "pos_encoding" in obs or "xyz" not in obs:
        return obs
    leaf = obs["xyz"]
    pe = synth_pos_encoding(spec.pos_rows, spec.points_per_frame)
    obs = dict(obs)
    obs["pos_encoding"] = jnp.broadcast_to(pe, leaf.shape[:-2] + pe.shape)
    return obs
