"""Combined-phase experiment harness: isolate where the env+grad cycle time
goes on the tunneled TPU (act fetch latency/polling vs update queue vs sim).

Usage: python tools/exp_combined.py [--fused] [--groups 4] [--chunk 8]
       [--cycles 6] [--sleep-poll] [--batch 256]

Prints per-config: combined steps/s + counts/durations of act dispatches,
act fetches (blocked time), update dispatches, sim waits.
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from pointcloud_rl_tpu.utils import enable_compilation_cache  # noqa: E402

enable_compilation_cache()  # persist relay compiles (cold fused scan ~5 min)

from bench import (ACTION_DIM, BATCH, N_POINTS, NUM_PROCS, build_agent,
                   device_memory, make_rollout)  # noqa: E402


def measure(agent, rollout, mem, cycles, steps_per_env, chunk, sleep_poll):
    import time as _time

    from pointcloud_rl_tpu.utils.tree_ops import tree_map

    vec_metrics = None
    n = rollout.num_envs * steps_per_env
    stats = dict(act_dispatch=0.0, act_fetch=0.0, act_fetch_n=0, upd_dispatch=0.0,
                 upd_n=0, sim_wait=0.0, poll_sleep=0.0)

    # warm/compile
    rollout.forward_with_policy(agent, rollout.num_envs, mem)
    np.asarray(agent.update_parameters_scan(mem, chunk))

    t_start = _time.monotonic()
    for _ in range(cycles):
        groups = np.array_split(np.arange(rollout.num_envs), rollout.pipeline_groups)
        NEED_ACT, ACT_PENDING, SIMULATING, DONE = range(4)
        state = [NEED_ACT] * len(groups)
        remaining = [steps_per_env] * len(groups)
        futures = {}
        done_upd = 0

        def _obs_of(idx):
            return tree_map(lambda x: x[idx], rollout.vec_env.recent_obs)

        def maybe_update():
            nonlocal done_upd, vec_metrics
            if done_upd + chunk <= n:
                t0 = _time.monotonic()
                v = agent.update_parameters_scan(mem, chunk)
                vec_metrics = v if vec_metrics is None else vec_metrics + v
                stats["upd_dispatch"] += _time.monotonic() - t0
                stats["upd_n"] += chunk
                done_upd += chunk

        while any(s != DONE for s in state):
            progress = False
            for g, idx in enumerate(groups):
                if state[g] == NEED_ACT:
                    t0 = _time.monotonic()
                    futures[g] = pi_forward(agent, _obs_of(idx))
                    stats["act_dispatch"] += _time.monotonic() - t0
                    state[g] = ACT_PENDING
                    progress = True
                elif state[g] == ACT_PENDING and futures[g].is_ready():
                    t0 = _time.monotonic()
                    actions = np.asarray(futures.pop(g))
                    stats["act_fetch"] += _time.monotonic() - t0
                    stats["act_fetch_n"] += 1
                    rollout.vec_env.step_dict_async(actions, idx=idx)
                    state[g] = SIMULATING
                    maybe_update()
                    progress = True
                elif state[g] == SIMULATING:
                    t0 = _time.monotonic()
                    ok = rollout.vec_env.step_dict_poll(idx=idx)
                    if ok:
                        trans = rollout.vec_env.step_dict_wait(idx=idx)
                        stats["sim_wait"] += _time.monotonic() - t0
                        remaining[g] -= 1
                        state[g] = NEED_ACT if remaining[g] > 0 else DONE
                        progress = True
            if not progress:
                if sleep_poll:
                    t0 = _time.monotonic()
                    _time.sleep(0.002)
                    stats["poll_sleep"] += _time.monotonic() - t0
                    continue
                pend = [g for g in range(len(groups)) if state[g] == ACT_PENDING]
                if pend:
                    g = pend[0]
                    t0 = _time.monotonic()
                    actions = np.asarray(futures.pop(g))
                    stats["act_fetch"] += _time.monotonic() - t0
                    stats["act_fetch_n"] += 1
                    rollout.vec_env.step_dict_async(actions, idx=groups[g])
                    state[g] = SIMULATING
                    maybe_update()
                else:
                    sim = [g for g in range(len(groups)) if state[g] == SIMULATING]
                    t0 = _time.monotonic()
                    trans = rollout.vec_env.step_dict_wait(idx=groups[sim[0]])
                    stats["sim_wait"] += _time.monotonic() - t0
                    remaining[sim[0]] -= 1
                    state[sim[0]] = NEED_ACT if remaining[sim[0]] > 0 else DONE
        while done_upd + chunk <= n:
            maybe_update()
    np.asarray(vec_metrics)
    dt = _time.monotonic() - t_start
    return cycles * n / dt, stats, dt


def pi_forward(agent, obs):
    return agent.forward_async(obs, mode="explore")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cycles", type=int, default=6)
    p.add_argument("--steps-per-env", type=int, default=2)
    p.add_argument("--fused", action="store_true",
                   help="Pallas body (slow remote compile); default XLA body for iteration")
    p.add_argument("--sweep", default="4:8:0,2:8:0,4:8:1,2:16:0,1:16:0,4:16:0",
                   help="comma list of groups:chunk:sleep_poll")
    args = p.parse_args()

    if args.fused:
        agent = build_agent()
    else:
        from __graft_entry__ import _agent_cfg
        from pointcloud_rl_tpu.algorithms import build_agent as _build
        cfg = _agent_cfg(N_POINTS, ACTION_DIM, fused=False)
        cfg["batch_size"] = BATCH
        cfg["bf16"] = True
        agent = _build(cfg)
    mem = device_memory()
    rollout, env_name = make_rollout()
    try:
        for spec in args.sweep.split(","):
            g, c, s = (int(v) for v in spec.split(":"))
            rollout.pipeline_groups = g
            rate, stats, dt = measure(agent, rollout, mem, args.cycles,
                                      args.steps_per_env, c, bool(s))
            n_total = args.cycles * rollout.num_envs * args.steps_per_env
            print(f"groups={g} chunk={c} sleep_poll={bool(s)}: "
                  f"{rate:.1f} steps/s ({n_total} steps in {dt:.2f}s)", flush=True)
            per = {k: (round(v * 1e3 / args.cycles, 1) if isinstance(v, float) else v)
                   for k, v in stats.items()}
            print(f"  per-cycle ms: {per}", flush=True)
    finally:
        rollout.close()


if __name__ == "__main__":
    main()
