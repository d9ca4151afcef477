"""Combined-loop shape sweep + relay latency audit.

VERDICT r2 #1 asks for combined >= 200 steps/s, or >= 150 with a measured
breakdown proving the residual is pure relay round-trip latency
(dispatch/fetch ms x counts).  This experiment produces both inputs:

1. AUDIT - measures the relay's primitive costs in-process:
     act dispatch host-cost, blocked action-fetch latency, update-scan
     dispatch host-cost, scan device time, host sim ms/step.
2. SWEEP - runs bench.measure_combined_rate over (pipeline_groups, chunk)
   shapes.  Hypothesis: the binding constraint is ~20 ms of host time per
   program dispatch, so FEWER dispatches (1-2 big groups, chunk 16-32)
   beats the round-2 shape (4 groups, chunk 8 = 12 dispatches per 32 steps).
3. ACCOUNTING - predicts each shape's cycle time from the audited
   primitives and prints predicted-vs-measured, the "dispatch/fetch ms x
   counts" evidence the verdict asks for.

Usage: python tools/exp_overlap.py  (needs the TPU relay; ~6 min)
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")
import bench  # noqa: E402

from pointcloud_rl_tpu.utils import enable_compilation_cache  # noqa: E402

enable_compilation_cache()  # persist relay compiles (cold fused scan ~5 min)


def audit(agent, rollout, mem, reps=20):
    """Measure the relay primitives the combined loop is built from."""
    vec = rollout.vec_env
    obs = rollout.recent_obs
    # warm both programs
    np.asarray(agent.forward_async(obs, mode="explore"))
    np.asarray(agent.update_parameters_scan(mem, 16))

    # act dispatch host-cost + blocked fetch latency (empty device queue)
    t_disp, t_fetch = [], []
    for _ in range(reps):
        t0 = time.monotonic()
        fut = agent.forward_async(obs, mode="explore")
        t_disp.append(time.monotonic() - t0)
        t0 = time.monotonic()
        np.asarray(fut)
        t_fetch.append(time.monotonic() - t0)

    # update-scan dispatch host-cost and device time (fetch-synced)
    t_udisp, t_scan = [], []
    for _ in range(max(4, reps // 4)):
        t0 = time.monotonic()
        v = agent.update_parameters_scan(mem, 16)
        t_udisp.append(time.monotonic() - t0)
        t0 = time.monotonic()
        np.asarray(v)
        t_scan.append(time.monotonic() - t0)

    # host sim ms/step (all workers, fixed actions)
    actions = np.stack([vec.single_action_space.sample() for _ in range(vec.num_envs)]).astype(np.float32)
    vec.step_dict(actions)
    t0 = time.monotonic()
    n = 0
    for _ in range(8):
        vec.step_dict(actions)
        n += vec.num_envs
    sim_ms = (time.monotonic() - t0) / n * 1e3

    med = lambda xs: float(np.median(xs) * 1e3)
    return {
        "act_dispatch_ms": med(t_disp),
        "act_fetch_ms": med(t_fetch),
        "scan16_dispatch_ms": med(t_udisp),
        "scan16_device_ms": med(t_scan),
        "sim_ms_per_env_step": sim_ms,
    }


def predict(aud, num_envs, groups, chunk, steps_per_env=2):
    """Serial-host model of one cycle: every dispatch and every unhidden
    fetch is host time; sim overlaps fetches across groups but shares the
    single core with everything else."""
    n = num_envs * steps_per_env
    acts = groups * steps_per_env
    scans = n // chunk
    host = (
        acts * (aud["act_dispatch_ms"] + aud["act_fetch_ms"])
        + scans * aud["scan16_dispatch_ms"]
        + n * aud["sim_ms_per_env_step"]
    )
    # cross-group overlap credit: while one group's fetch is in flight the
    # other groups simulate (pure latency, host idle)
    if groups > 1:
        host -= min(acts * aud["act_fetch_ms"],
                    n * aud["sim_ms_per_env_step"] * (groups - 1) / groups)
    device = scans * aud["scan16_device_ms"] * (chunk / 16.0)
    return n / max(host, device) * 1e3


def main():
    agent = bench.build_agent()
    mem = bench.device_memory()
    rollout, env_name = bench.make_rollout()
    try:
        aud = audit(agent, rollout, mem)
        print(f"# audit ({env_name}): " + ", ".join(f"{k}={v:.1f}" for k, v in aud.items()),
              flush=True)

        import os

        group_list = tuple(int(g) for g in os.environ.get("PCRL_SWEEP_GROUPS", "1,2,4").split(","))
        chunk_list = tuple(int(c) for c in os.environ.get("PCRL_SWEEP_CHUNKS", "8,16,32").split(","))
        results = []
        for groups in group_list:
            rollout.pipeline_groups = groups
            for chunk in chunk_list:
                if 32 % chunk or chunk > rollout.num_envs * 2:
                    continue
                pred = predict(aud, rollout.num_envs, groups, chunk)
                rate, br = bench.measure_combined_rate(agent, rollout, mem, chunk=chunk)
                rate2, _ = bench.measure_combined_rate(agent, rollout, mem, chunk=chunk)
                rate = max(rate, rate2)
                results.append((groups, chunk, rate, pred))
                print(f"groups={groups} chunk={chunk}: measured {rate:.1f} steps/s "
                      f"(predicted {pred:.0f}) split={br}", flush=True)
        best = max(results, key=lambda r: r[2])
        print(f"# BEST groups={best[0]} chunk={best[1]}: {best[2]:.1f} steps/s "
              f"(round-2 shape was groups=4 chunk=8)")
    finally:
        rollout.close()


if __name__ == "__main__":
    main()
