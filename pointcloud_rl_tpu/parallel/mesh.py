"""Data parallelism over a jax.sharding.Mesh.

Replaces the reference's gradient plane (one process per GPU + per-module
DDP over NCCL, reference run_rl.py:315-329 / module_utils.py:322) the TPU
way: ONE process jits the SAME pure update function with the train state
replicated and the batch sharded on the ``data`` mesh axis; XLA's SPMD
partitioner inserts the gradient all-reduce over ICI automatically.  There
are no wrapper objects, no ``no_sync`` contexts, and no SyncBN (the model
zoo is LayerNorm-only).

The mesh is 1-D ``("data",)`` today — model axes are deliberately left open
(the reference has no TP/PP; SURVEY.md §2.8) but adding one is a mesh-shape
change, not a code change.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: Optional[int] = None, axis_name: str = "data") -> Mesh:
    devices = jax.devices()
    if num_devices is not None:
        assert len(devices) >= num_devices, f"Need {num_devices} devices, have {len(devices)}"
        devices = devices[:num_devices]
    return Mesh(np.array(devices), (axis_name,))


def data_parallel_shardings(mesh: Mesh, axis_name: str = "data"):
    """(replicated, batch-sharded) NamedShardings for (state, batch)."""
    replicated = NamedSharding(mesh, P())
    sharded = NamedSharding(mesh, P(axis_name))
    return replicated, sharded


def setup_data_parallel(agent, num_devices: int, axis_name: str = "data", replay=None) -> Mesh:
    """Re-jit the agent's update with (replicated state, sharded batch).

    The update function itself is unchanged — replication + batch sharding
    make XLA emit an all-reduce for the gradients (mean over the global
    batch), which is exactly DDP's semantics with the all-reduce fused into
    the step instead of hooked onto backward.

    Covers ALL update entry points, not just the host-batch path:
    - the fused sample+update and its scanned variant over an HBM-resident
      ``DeviceReplayMemory`` re-jit lazily against ``agent._batch_sharding``
      (the gather output is sharding-constrained onto the data axis, so each
      device gathers its rows from its local storage copy — no collectives in
      the sample, one grad all-reduce in the step);
    - act fns are dropped so they re-compile against the replicated state;
    - ``replay`` (if an already-allocated DeviceReplayMemory) has its storage
      placed on the mesh, and future allocations inherit the placement.

    Storage is REPLICATED across the mesh: sampling stays a local gather and
    the update is bit-identical to single-device (same indices, same math).
    The memory cost (capacity x num_devices) is acceptable at reference scale
    (100k steps of 1200x6 f32 clouds ~ 3 GB/chip); a capacity-sharded layout
    would trade that for gather collectives.
    """
    mesh = make_mesh(num_devices, axis_name)
    replicated, sharded = data_parallel_shardings(mesh, axis_name)
    agent.train_state = jax.device_put(agent.train_state, replicated)
    agent._update_jit = jax.jit(
        agent._packed_update,
        in_shardings=(replicated, sharded),
        out_shardings=(replicated, replicated),
        donate_argnums=(0,),
    )
    # Lazily-built storage paths pick the shardings up on next build.
    agent._batch_sharding = sharded
    agent._replicated_sharding = replicated
    agent._storage_update_jit = None
    if hasattr(agent, "_storage_scan_jit"):
        agent._storage_scan_jit = None
    agent._act_fns = {}
    if replay is not None and hasattr(replay, "place_on"):
        replay.place_on(replicated)
    agent.mesh = mesh
    agent.dp_size = num_devices
    return mesh
