"""Host-side agent wrapper around jitted functional cores.

Replaces the reference's BaseAgent (``pyrl/utils/torch/module_utils.py:112``):
device placement, inference forward (obs -> device -> actor -> host actions),
and the update entry point.  There is no DDP wrap/unwrap — data parallelism
is expressed by jitting the same pure update over a sharded mesh (see
``parallel/``).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


def run_with_mini_batch(fn, data, batch_size: int = 256):
    """Apply a (jitted) function over leading-axis minibatches and
    concatenate results (reference run_with_mini_batch, misc.py:43-177).
    Pads the tail chunk to the full batch size to avoid extra compiles."""
    import numpy as np

    from ..utils.tree_ops import first_leaf, tree_concat, tree_map, tree_slice

    n = len(first_leaf(data))
    outs = []
    for s in range(0, n, batch_size):
        chunk = tree_slice(data, slice(s, min(s + batch_size, n)))
        m = len(first_leaf(chunk))
        if m < batch_size:
            pad = tree_map(lambda x: np.concatenate([x, np.repeat(x[-1:], batch_size - m, 0)]), chunk)
            out = fn(pad)
            out = tree_map(lambda x: np.asarray(x)[:m], out)
        else:
            out = tree_map(np.asarray, fn(chunk))
        outs.append(out)
    return tree_concat(outs, 0)


def compute_gae(rewards, values, next_values, episode_dones, gamma: float = 0.99, lam: float = 0.95):
    """Generalized advantage estimation over a [T, ...] trajectory
    (reference BaseAgent.compute_gae, module_utils.py:193) as a lax.scan.

    Returns (advantages, returns) with the same shape as rewards.
    """
    import jax
    import jax.numpy as jnp

    rewards = jnp.asarray(rewards, jnp.float32)
    not_done = 1.0 - jnp.asarray(episode_dones, jnp.float32)
    deltas = rewards + gamma * jnp.asarray(next_values) * not_done - jnp.asarray(values)

    def scan_fn(carry, x):
        delta, nd = x
        adv = delta + gamma * lam * nd * carry
        return adv, adv

    _, adv_rev = jax.lax.scan(scan_fn, jnp.zeros_like(deltas[0]), (deltas[::-1], not_done[::-1]))
    advantages = adv_rev[::-1]
    returns = advantages + jnp.asarray(values)
    return advantages, returns


def example_obs_from_shape(obs_shape, batch: int = 1):
    """Synthesize a zero observation batch matching the env's obs shapes.

    ``obs_shape`` is a dict of per-key shapes (no batch axis) or an int/tuple
    for flat state observations.  rgb keys are uint8 (env contract).
    """
    if isinstance(obs_shape, dict):
        out = {}
        for k, shape in obs_shape.items():
            shape = (shape,) if isinstance(shape, int) else tuple(shape)
            dtype = np.uint8 if k == "rgb" else np.float32
            out[k] = np.zeros((batch,) + shape, dtype)
        return out
    shape = (obs_shape,) if isinstance(obs_shape, int) else tuple(obs_shape)
    return np.zeros((batch,) + shape, np.float32)


def pack_pointcloud_obs(obs: Dict[str, Any], spec=None):
    """Fuse a pointcloud obs dict into ONE float32 array (+ robot state).

    Exactly replicates PointNet preprocess channel assembly (xyz, rgb/255,
    pos_encoding, seg channel-first) on the host, so inference needs a
    single host->device upload instead of one per leaf — on remote/tunneled
    devices each upload is a round trip.

    ``spec`` (ObsTransferSpec): optionally skip the constant pos_encoding
    block (re-synthesized on device by ``_device_obs``) and/or pack in a
    narrower wire dtype — see algorithms/obs_transfer.py.
    """
    drop_pos = spec is not None and spec.drop_pos_encoding
    feats = [np.asarray(obs["xyz"])]
    if "rgb" in obs:
        rgb = np.asarray(obs["rgb"])
        # exact reference rounding: divide in f32 (uint8/255), cast at assign
        feats.append(np.divide(rgb, np.float32(255.0), dtype=np.float32)
                     if rgb.dtype == np.uint8 else rgb)
    for key in ("pos_encoding", "seg"):
        if key in obs and not (drop_pos and key == "pos_encoding"):
            feats.append(np.asarray(obs[key]))
    # Single-pass assembly: slice-assign each block into ONE buffer already
    # in the wire dtype.  The old concat(f32) + astype(f16) path wrote the
    # full tensor three times (plus f32 temps); on the 1-core host this
    # pack sat at ~6-7 ms per act dispatch (cProfile, round 4) — the
    # slice-assign form is a single cast-write per block.
    out_dtype = spec.pack_dtype if (spec is not None and spec.pack_dtype is not None) else np.float32
    ch = sum(f.shape[-2] for f in feats)
    packed = np.empty(feats[0].shape[:-2] + (ch,) + feats[0].shape[-1:], out_dtype)
    at = 0
    for f in feats:
        packed[..., at : at + f.shape[-2], :] = f
        at += f.shape[-2]
    state = obs.get("state", obs.get("agent"))
    return packed, (np.asarray(state, np.float32) if state is not None else None)


class BaseAgent:
    """Common host plumbing; algorithm classes implement ``_update_step``."""

    def __init__(self):
        self._act_fns: Dict[str, Callable] = {}
        self.train_state = None
        self.device = jax.devices()[0]
        self.obs_transfer = None  # ObsTransferSpec (init_obs_transfer)

    def init_obs_transfer(self, cfg, obs_shape) -> None:
        """Arm the obs payload reductions (algorithms/obs_transfer.py):
        drop the constant pos_encoding block from uploads/storage and
        re-synthesize it on device, optionally packing the act upload in a
        narrower dtype.  Call from the agent constructor with the env
        probe's obs shapes."""
        from .obs_transfer import make_obs_transfer

        self.obs_transfer = make_obs_transfer(cfg, obs_shape)

    def _device_obs(self, obs):
        """Trace-time obs completion inside jitted programs: re-attach the
        pos_encoding block a transfer spec dropped host-side.  No-op when
        the spec is off or the obs already carry the block (key/channel
        presence is static at trace time)."""
        spec = self.obs_transfer
        if spec is None:
            return obs
        from .obs_transfer import complete_obs_dict, complete_packed

        if not isinstance(obs, dict):
            return complete_packed(jnp.asarray(obs), spec) if spec.drop_pos_encoding or spec.pack_dtype else obs
        if "packed" in obs:
            obs = dict(obs)
            obs["packed"] = complete_packed(jnp.asarray(obs["packed"]), spec)
            return obs
        if spec.drop_pos_encoding:
            return complete_obs_dict(obs, spec)
        return obs

    # -- train/eval mode are no-ops (kept for API parity; flax is stateless)
    def train(self):
        return self

    def eval(self):
        return self

    # ------------------------------------------------------------ inference
    def _build_act(self, mode: str) -> Callable:
        raise NotImplementedError

    def forward_async(self, obs, mode: str = "explore", **kwargs):
        """Dispatch the jitted act WITHOUT fetching: returns a device array
        whose device->host copy is already in flight (``copy_to_host_async``).
        ``np.asarray`` on the result completes the fetch.  On remote/tunneled
        devices the fetch latency dominates the act cost; dispatching here and
        fetching later lets env simulation overlap it (pipelined rollout)."""
        if (
            isinstance(obs, dict)
            and "xyz" in obs
            and getattr(self, "inference_aug", None) is None
        ):
            spec = self.obs_transfer
            if spec is not None and spec.pack_mode == "dict":
                # Ship the env's native leaves (rgb stays uint8 — exact and
                # 4x narrower than the f32 pack) minus the dropped constant;
                # only the model-consumed keys ride the wire (same key set
                # the packed path assembles + the robot state).
                keep = ("xyz", "rgb", "seg", "state", "agent") + (
                    () if spec.drop_pos_encoding else ("pos_encoding",))
                obs = {k: v for k, v in obs.items() if k in keep}
                if spec.pack_dtype is not None:
                    obs["xyz"] = np.asarray(obs["xyz"]).astype(spec.pack_dtype)
            else:
                packed, state = pack_pointcloud_obs(obs, spec=spec)
                obs = packed if state is None else {"state": state, "packed": packed}
        model = getattr(self, "model", None)
        if (
            mode == "explore"
            and getattr(self, "_fused_plan", None) is not None
            and not (model is not None and getattr(model, "is_recurrent", False))
        ):
            # Armed act-fused updates (set_fused_updates): the act program
            # carries a chunk of gradient steps — one dispatch, one fetch.
            actions = self._fused_act_dispatch(obs)
            if actions is not None:
                if hasattr(actions, "copy_to_host_async"):
                    actions.copy_to_host_async()
                return actions
        if mode not in self._act_fns:
            self._act_fns[mode] = self._build_act(mode)
        if model is not None and getattr(model, "is_recurrent", False):
            leaf = obs if not isinstance(obs, dict) else next(iter(obs.values()))
            B = leaf.shape[0]
            if getattr(self, "_rnn_states", None) is None or self._rnn_states.shape[0] != B:
                self._rnn_states = model.rnn.initial_state(B)
            actions, self._rnn_states, self.train_state = self._act_fns[mode](
                self.train_state, obs, self._rnn_states
            )
        else:
            actions, self.train_state = self._act_fns[mode](self.train_state, obs)
        if hasattr(actions, "copy_to_host_async"):
            actions.copy_to_host_async()
        return actions

    def forward(self, obs, mode: str = "explore", **kwargs) -> np.ndarray:
        """obs (numpy tree, batched) -> actions (numpy [B, A])."""
        return np.asarray(self.forward_async(obs, mode=mode, **kwargs))

    def reset_rnn_states(self, dones=None) -> None:
        """Zero recurrent states (for done envs when ``dones`` [B, 1] given)."""
        if getattr(self, "_rnn_states", None) is None:
            return
        if dones is None:
            self._rnn_states = None
        else:
            mask = 1.0 - np.asarray(dones, np.float32).reshape(-1, 1, 1)
            self._rnn_states = self._rnn_states * mask

    def __call__(self, obs, mode: str = "explore", **kwargs):
        return self.forward(obs, mode=mode, **kwargs)

    # ------------------------------------------------------------- updates
    def update_parameters(self, memory, updates: int) -> Dict[str, float]:
        raise NotImplementedError

    # ---------------------------------------------------------- checkpoint
    def state_dict(self):
        """Checkpointable pytree (params + optimizers + alpha + counters)."""
        return jax.device_get(self.train_state)

    def load_state_dict(self, state) -> None:
        # Keep leaf dtypes/structure of the current state.
        self.train_state = jax.tree_util.tree_map(jnp.asarray, state)

    @property
    def num_params(self) -> int:
        if self.train_state is None:
            return 0
        params = getattr(self.train_state, "params", None)
        if params is None:
            return 0
        return int(sum(np.prod(p.shape) for p in jax.tree_util.tree_leaves(params)))
