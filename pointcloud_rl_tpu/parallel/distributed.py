"""Multi-host (pod) initialization and cross-host reductions.

Replaces the reference's torch.distributed launchers + TCPStore control
plane (reference pyrl/utils/torch/distributed_utils.py): one jax process
per host joins via ``jax.distributed.initialize`` (coordinator address from
env or args, like the reference's pytorch/slurm launcher env parsing); the
gradient plane needs nothing further — the data-parallel mesh simply spans
all global devices and XLA runs the same jitted update SPMD over ICI+DCN.

Host-side scalars (episode statistics) reduce with
``multihost_utils.process_allgather``; lead-host gating uses
``jax.process_index() == 0`` (the reference's rank-0 semantics).
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Join a multi-host jax runtime. No-op (returns False) when single-host.

    Env fallbacks mirror common launchers: JAX_COORDINATOR_ADDRESS /
    SLURM / PYRL-style MASTER_ADDR:MASTER_PORT + RANK/WORLD_SIZE.
    """
    import jax

    coordinator_address = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coordinator_address is None and os.environ.get("MASTER_ADDR"):
        coordinator_address = f"{os.environ['MASTER_ADDR']}:{os.environ.get('MASTER_PORT', '12355')}"
    if num_processes is None:
        num_processes = int(os.environ.get("WORLD_SIZE", os.environ.get("SLURM_NTASKS", "1")))
    if process_id is None:
        process_id = int(os.environ.get("RANK", os.environ.get("SLURM_PROCID", "0")))
    if coordinator_address is None or num_processes <= 1:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def is_lead_process() -> bool:
    import jax

    return jax.process_index() == 0


def allreduce_stats(stats: Dict[str, float], op: str = "mean") -> Dict[str, float]:
    """Cross-host reduction of a flat scalar dict (reference GDict.allreduce,
    array_ops.py:745).  Single-host: identity."""
    import jax

    if jax.process_count() == 1:
        return stats
    from jax.experimental import multihost_utils

    keys = sorted(stats)
    local = np.asarray([float(stats[k]) for k in keys], np.float64)
    gathered = multihost_utils.process_allgather(local)  # [num_hosts, K]
    if op == "mean":
        red = gathered.mean(axis=0)
    elif op == "sum":
        red = gathered.sum(axis=0)
    elif op == "min":
        red = gathered.min(axis=0)
    elif op == "max":
        red = gathered.max(axis=0)
    else:
        raise KeyError(op)
    return dict(zip(keys, red))


class DistVar:
    """Named cross-host counter (reference TCPStore DistVar,
    distributed_utils.py:157-215), backed by the JAX coordination service's
    key-value store: ``add`` is a one-sided ``key_value_increment`` RPC and
    ``get`` a non-blocking ``key_value_try_get``, so hosts may call them any
    number of times (including zero) without deadlocking peers — unlike any
    allgather-based design, where a host that exits its loop early leaves
    voters blocked in a collective forever.

    Keys are namespaced by a per-name generation counter so a fresh DistVar
    with the same name starts at zero even though coordination-service keys
    persist; all hosts construct vars for a given name in the same order
    (the training loop is symmetric), so generations agree without a sync.
    """

    _generations: Dict[str, int] = {}

    def __init__(self, name: str):
        gen = DistVar._generations.get(name, 0)
        DistVar._generations[name] = gen + 1
        self.key = f"pcrl/distvar/{name}/{gen}"
        self._local = 0
        from jax._src import distributed

        self._client = distributed.global_state.client  # None when single-host

    def add(self, value: int = 1) -> None:
        if self._client is None:
            self._local += int(value)
        else:
            self._client.key_value_increment(self.key, int(value))

    def get(self) -> int:
        if self._client is None:
            return self._local
        try:
            return int(self._client.key_value_try_get(self.key))
        except Exception:  # NOT_FOUND: nobody has incremented yet
            return 0
