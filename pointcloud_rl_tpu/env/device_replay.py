"""HBM-resident replay buffer with on-device sampling.

The TPU-native replacement for host replay in the hot loop (SURVEY.md §7.1
TreeBuffer): transitions are pushed once (tiny per-step host->device copies)
and training batches are GATHERED ON DEVICE, so the 20+ MB per-update batch
transfer of a host buffer disappears.  At 1200 pts x 6 ch the full 100k-step
buffer is a few GB — comfortably HBM-resident on one chip.

Pushes use jitted ``dynamic_update_slice`` ring writes with donated storage
(in-place update, no reallocation); sampling is a jitted gather with a
threaded PRNG key.  Host-side wraparound splitting keeps shapes static.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.tree_ops import first_leaf, tree_map
from .builder import REPLAYS

_SKIP_KEYS = ("infos",)


@partial(jax.jit, donate_argnums=0, static_argnames=())
def _ring_write(storage, batch, position):
    return jax.tree_util.tree_map(
        lambda s, b: jax.lax.dynamic_update_slice_in_dim(s, b.astype(s.dtype), position, axis=0),
        storage,
        batch,
    )


@partial(jax.jit, static_argnames=("batch_size",))
def _gather(storage, key, size, batch_size):
    idx = jax.random.randint(key, (batch_size,), 0, size)
    return jax.tree_util.tree_map(lambda s: s.at[idx].get(mode="promise_in_bounds"), storage)


@REPLAYS.register_module()
class DeviceReplayMemory:
    """Same interface as ReplayMemory where the hot loop touches it."""

    def __init__(self, capacity: int, sampling_cfg: Optional[dict] = None, keys: Optional[List[str]] = None,
                 seed: Optional[int] = None, transfer_cfg: Optional[dict] = None, **kwargs):
        self.capacity = int(capacity)
        self.storage = None  # pytree of [capacity, ...] device arrays
        self.position = 0
        self.running_count = 0
        self.keys = keys
        # Obs payload reductions applied before upload/storage (see
        # algorithms/obs_transfer.py): drop_subkeys removes constant blocks
        # the update re-synthesizes on device (e.g. pos_encoding);
        # dtype_map narrows wire+HBM dtypes per sub-key (e.g. xyz float16);
        # pack_features glues pointcloud obs dicts into the model-input
        # tensor AT PUSH TIME ({"pcd": [N, C] bf16 channel-last, "state"?})
        # so the update's obs prep is just the sampling gather — see
        # obs_transfer.pack_device_features for the profile-driven why.
        # Incompatible with in-update augmentations that need raw xyz/rgb
        # channel layout (DrQ shift runs on xyz; the packed tensor fast
        # path is for the non-augmented SAC pipeline).
        self.transfer_cfg = dict(transfer_cfg) if transfer_cfg else None
        self._pack_features = None
        self._pack_dtype = None
        if self.transfer_cfg and self.transfer_cfg.get("pack_features"):
            pf = self.transfer_cfg.pop("pack_features")
            self._pack_dtype = jnp.bfloat16 if pf is True else np.dtype(pf)
            if not self.transfer_cfg:
                self.transfer_cfg = None
            # the jitted packer is built at first push — it needs the
            # pos_encoding block shape to strip it from the relay payload
            # and re-synthesize it on device (see _build_packer)
            self._pack_features = self._build_packer
        self.sharding = None  # set via place_on() under a data-parallel mesh
        self._key = jax.random.PRNGKey(seed if seed is not None else 0)
        # trajectory caching (full-episode mode) stays host-side
        from .replay import ReplayMemory

        self._traj_cache: Dict[int, list] = {}
        self._host_cache_traj = ReplayMemory.cache_trajectories
        self._host_push_cached = ReplayMemory.push_cached_trajectories

    def __len__(self) -> int:
        return min(self.running_count, self.capacity)

    @property
    def device_size(self):
        """len(self) as a cached DEVICE scalar: uploading the size on every
        fused-update dispatch costs a host->device round trip on tunneled
        runtimes (~tens of ms); the cache refreshes only when the size
        changes (it stops changing once the ring is full)."""
        size = len(self)
        if getattr(self, "_size_cache_val", None) != size:
            arr = jnp.asarray(size, jnp.int32)
            if self.sharding is not None:
                arr = jax.device_put(arr, self.sharding)
            self._size_cache = arr
            self._size_cache_val = size
        return self._size_cache

    @property
    def size(self) -> int:
        return len(self)

    def reset(self) -> None:
        self.position = 0
        self.running_count = 0

    def _clean(self, items: Dict[str, Any]) -> Dict[str, Any]:
        from .replay import apply_transfer

        items = {k: v for k, v in items.items() if k not in _SKIP_KEYS}
        if self.keys is not None:
            items = {k: v for k, v in items.items() if k in self.keys}
        return apply_transfer(items, self.transfer_cfg)

    def _alloc(self, items) -> None:
        def _zeros(x):
            x = np.asarray(x)
            return jnp.zeros((self.capacity,) + x.shape[1:], x.dtype)

        self.storage = tree_map(_zeros, items)
        if self.sharding is not None:
            self.storage = jax.device_put(self.storage, self.sharding)

    def place_on(self, sharding) -> None:
        """Place storage (current and future allocations) on a mesh sharding.

        Under data parallelism the storage is replicated so the fused
        sample+update's gather stays device-local (see parallel/mesh.py).
        """
        self.sharding = sharding
        if self.storage is not None:
            self.storage = jax.device_put(self.storage, sharding)

    def _build_packer(self, items: Dict[str, Any]):
        """First-push packer construction: record the pos_encoding block
        shape, then replace self._pack_features with a jitted packer that
        STRIPS the block host-side (it's a constant one-hot — ~30% of a
        stacked-DMC push's relay bytes) and re-synthesizes it on device
        inside the pack (bitwise identical, obs_transfer.synth_pos_encoding)."""
        from ..algorithms.obs_transfer import pack_device_features

        dtype = self._pack_dtype
        synth = None
        obs = items.get("obs")
        if isinstance(obs, dict) and "pos_encoding" in obs:
            rows, n = (int(s) for s in np.asarray(obs["pos_encoding"]).shape[-2:])
            if n % rows == 0:
                synth = (rows, n // rows)

        @jax.jit
        def _packer(items):
            items = dict(items)
            for key in ("obs", "next_obs"):
                o = items.get(key)
                if isinstance(o, dict) and "xyz" in o:
                    items[key] = pack_device_features(o, dtype, synth_pos=synth)
            return items

        def _strip_and_pack(items):
            if synth is not None:
                for key in ("obs", "next_obs"):
                    o = items.get(key)
                    if isinstance(o, dict) and "pos_encoding" in o:
                        o = dict(o)
                        o.pop("pos_encoding")
                        items = dict(items)
                        items[key] = o
            return _packer(items)

        self._pack_features = _strip_and_pack
        return _strip_and_pack(items)

    def push_batch(self, items: Dict[str, Any]) -> None:
        items = self._clean(items)
        if self._pack_features is not None:
            items = self._pack_features(items)
        batch = len(first_leaf(items))
        if batch > self.capacity:
            items = tree_map(lambda x: x[: self.capacity], items)
            batch = self.capacity
        if self.storage is None:
            self._alloc(items)
        end = self.position + batch
        if end <= self.capacity:
            self.storage = _ring_write(self.storage, items, self.position)
        else:
            first = self.capacity - self.position
            self.storage = _ring_write(self.storage, tree_map(lambda x: x[:first], items), self.position)
            self.storage = _ring_write(self.storage, tree_map(lambda x: x[first:], items), 0)
        self.position = end % self.capacity
        self.running_count += batch

    def push(self, item: Dict[str, Any]) -> None:
        self.push_batch(tree_map(lambda x: np.asarray(x)[None], item))

    # full-episode trajectory caching reuses the host implementation
    def cache_trajectories(self, items, max_push: int = -1) -> int:
        return self._host_cache_traj(self, items, max_push)

    def push_cached_trajectories(self, max_push: int = -1) -> int:
        return self._host_push_cached(self, max_push)

    def sample(self, batch_size: int) -> Dict[str, Any]:
        """Returns a batch of DEVICE arrays (no host round trip)."""
        assert len(self) > 0, "Cannot sample from an empty buffer"
        self._key, sub = jax.random.split(self._key)
        return _gather(self.storage, sub, self.device_size, batch_size)

    def tail(self, num: int) -> Dict[str, Any]:
        num = min(num, len(self))
        idx = (np.arange(self.position - num, self.position)) % self.capacity
        return jax.device_get(tree_map(lambda s: jnp.take(s, jnp.asarray(idx), axis=0), self.storage))

    def get_all(self) -> Dict[str, Any]:
        return jax.device_get(tree_map(lambda s: s[: len(self)], self.storage))

    def to_hdf5(self, filename: str) -> None:
        from .replay import ReplayMemory

        host = ReplayMemory(self.capacity)
        host.push_batch(self.get_all())
        host.to_hdf5(filename)

    def load_hdf5(self, filename: str, chunk: int = 4096) -> None:
        """Stream the snapshot in fixed-size chunks.

        A single 50k-row ``push_batch`` would (a) trace/compile fresh
        pack + ring-write programs for the one-off batch shape and (b) ship
        the whole multi-GB payload as ONE relay transfer that cannot overlap
        host HDF5 decode.  Fixed ``chunk`` rows compile two small programs
        once (full chunk + tail) and pipeline decode with device uploads.
        """
        import h5py

        from .replay import h5_read

        with h5py.File(filename, "r") as f:

            def _load(group, sl):
                return {
                    k: (_load(v, sl) if hasattr(v, "items") else h5_read(v, sl))
                    for k, v in group.items()
                }

            # length from any leaf dataset (walk to the first non-group)
            def _first_ds(g):
                for v in g.values():
                    if hasattr(v, "items"):
                        found = _first_ds(v)
                        if found is not None:
                            return found
                    else:
                        return v
                return None

            ds = _first_ds(f)
            n = 0 if ds is None else len(ds)
            for start in range(0, n, chunk):
                self.push_batch(_load(f, slice(start, min(start + chunk, n))))
