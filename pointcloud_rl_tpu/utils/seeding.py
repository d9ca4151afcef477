"""Seeding and process-level environment defaults.

Mirrors the reference's init discipline (pyrl/apis/run_rl.py:248-273 and
pyrl/utils/meta/env_var.py): per-rank seeds ``seed + rank``, single-threaded
BLAS for env worker processes, and MUJOCO_GL selection — translated to a
JAX-first stack where the device RNG is a threaded jax.random key.
"""

from __future__ import annotations

import os
import random
from typing import Optional

import numpy as np


def add_env_vars(single_thread_blas: bool = True) -> None:
    """Set library env defaults before heavy imports (idempotent)."""
    if single_thread_blas:
        for var in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS", "NUMEXPR_NUM_THREADS"):
            os.environ.setdefault(var, "1")
    os.environ.setdefault("MUJOCO_GL", "egl")


def enable_compilation_cache(path: Optional[str] = None) -> str:
    """Turn on JAX's persistent compilation cache (idempotent).

    On the tunneled TPU runtime a cold compile of the fused SAC update scan
    was measured at ~5 minutes; with the on-disk cache a later process
    reloads the same executable in seconds (probe: 1.17 s -> 0.15 s across
    processes).  Default location is ``<repo>/build/jax_cache`` (override
    with ``PCRL_JAX_CACHE``; set it to ``0`` to disable).  Must run before
    the first jit compile to help that compile.
    """
    import jax

    path = path or os.environ.get("PCRL_JAX_CACHE")
    if path == "0":
        return ""
    if not path:
        repo = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        path = os.path.join(repo, "build", "jax_cache")
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
    except Exception:  # non-writable dir / very old jax: run uncached
        return ""
    try:
        # Separate guard: if this knob is missing (older jax), the cache dir
        # above is already active — still report the cache as on.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass
    return path


def set_host_seed(seed: Optional[int]) -> Optional[int]:
    """Seed python/numpy host RNGs; returns the seed used."""
    if seed is None:
        seed = int.from_bytes(os.urandom(4), "little")
    random.seed(seed)
    np.random.seed(seed % (2**32))
    return seed


def worker_seed(base_seed: int, rank: int, worker_index: int = 0, num_workers: int = 1) -> int:
    """Deterministic distinct seed per (rank, env worker)."""
    return int(base_seed) + rank * max(num_workers, 1) + worker_index
