"""Worker-count sweep UNDER the round-3 transfer winners (f16 + eager push).

The round-3 worker sweep (16 vs 32, bench.py docstring) predates the
obs-transfer reduction: the blocked act fetch then cost ~43 ms, so halving
the fetch count (32 workers) bought ~21 ms/cycle while the 1-core host sim
slowdown (302 -> 253 env steps/s) cost about the same — a wash at ~122.
With the fetch at ~30 ms (f16 pack) and replay pushes riding the fetch
window (eager_push), the trade moves: the fetch saving shrinks but so does
the sim contention from flushes.  This re-measures combined steps/s at
16/24/32 workers with ONE agent build (same compiled update scans; the act
program recompiles per worker count).

Usage: python tools/exp_procs.py [procs ...]   (TPU relay; ~4 min/arm)
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")
import bench  # noqa: E402

from pointcloud_rl_tpu.utils import enable_compilation_cache  # noqa: E402

enable_compilation_cache()  # persist relay compiles (cold fused scan ~5 min)


def main():
    arms = [int(a) for a in sys.argv[1:]] or [16, 24, 32]
    agent = bench.build_agent()
    mem = bench.device_memory()
    # warm the shared update scans once (chunk grid below)
    results = {}
    for procs in arms:
        bench.NUM_PROCS = procs
        from pointcloud_rl_tpu.env import Rollout

        env_cfg = dict(type="gym", env_name="dmc_walker_walk-v0",
                       obs_mode="pointcloud", stack_frame=3)
        rollout = Rollout(env_cfg=env_cfg, num_procs=procs, base_seed=0,
                          pipeline_groups=1, eager_push=bench.EAGER_PUSH)
        try:
            env_rate = bench.measure_env_rate(rollout)
            cycle = procs * 2
            chunks = tuple(c for c in (16, 32) if c <= cycle) or (cycle,)
            best, best_chunk = 0.0, None
            for c in chunks:
                rate, breakdown = bench.measure_combined_rate(agent, rollout, mem, chunk=c)
                print(f"# procs={procs} chunk={c}: {rate:.1f} steps/s {breakdown}",
                      file=sys.stderr, flush=True)
                if rate > best:
                    best, best_chunk = rate, c
            results[procs] = (env_rate, best, best_chunk)
        finally:
            rollout.close()
        print(f"procs={procs}: env-only {env_rate:.1f} | combined best {best:.1f} "
              f"(chunk {best_chunk})", flush=True)
    print({k: (round(v[0], 1), round(v[1], 1), v[2]) for k, v in results.items()})


if __name__ == "__main__":
    main()
