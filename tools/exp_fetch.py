"""Act-fetch payload audit: how much of the blocked action-fetch latency is
obs UPLOAD wire time, and what the obs-transfer reductions buy back.

The round-3 overlap audit (tools/exp_overlap.py) showed blocked action
fetches (~40-45 ms each) bound the combined rate.  That fetch pays: the obs
upload tail (the dispatch is async — its wire time surfaces in the fetch
wait), the act program execution, and the relay round trip.  This
experiment separates the terms by sweeping the upload payload:

  full   — 9-channel float32 pack (the pre-transfer default, 55 KB/env)
  nopos  — pos_encoding dropped, synthesized on device   (37 KB/env)
  f16    — nopos + float16 wire dtype                    (18 KB/env)
  device — obs pre-resident on device                     (0 KB: pure
           execution + round trip, the relay latency floor)

Then re-runs bench.measure_combined_rate with the transfer-enabled agent to
see what the combined headline gains.

Usage: python tools/exp_fetch.py   (needs the TPU relay; ~5 min)
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")
import bench  # noqa: E402

from pointcloud_rl_tpu.utils import enable_compilation_cache  # noqa: E402

enable_compilation_cache()  # persist relay compiles (cold fused scan ~5 min)


def fetch_ms(agent, obs, reps=20):
    np.asarray(agent.forward_async(obs, mode="explore"))  # compile/warm
    ts = []
    for _ in range(reps):
        t0 = time.monotonic()
        fut = agent.forward_async(obs, mode="explore")
        t_disp = time.monotonic() - t0
        t0 = time.monotonic()
        np.asarray(fut)
        ts.append((t_disp * 1e3, (time.monotonic() - t0) * 1e3))
    d, f = zip(*ts)
    return float(np.median(d)), float(np.median(f))


def main():
    import jax

    from pointcloud_rl_tpu.algorithms import build_agent
    from __graft_entry__ import _agent_cfg, _example_obs

    n_points, action_dim, n_envs = bench.N_POINTS, bench.ACTION_DIM, bench.NUM_PROCS
    obs = _example_obs(n_envs, n_points, np.random.RandomState(0))

    base_cfg = _agent_cfg(n_points, action_dim, fused=True)
    base_cfg["bf16"] = True

    agents = {}
    agents["full"] = build_agent(dict(base_cfg))
    cfg = dict(base_cfg)
    cfg["obs_transfer_cfg"] = dict(pos_encoding_on_device=True)
    agents["nopos"] = build_agent(cfg)
    cfg = dict(base_cfg)
    cfg["obs_transfer_cfg"] = dict(pos_encoding_on_device=True, pack_dtype="float16")
    agents["f16"] = build_agent(cfg)
    cfg = dict(base_cfg)
    cfg["obs_transfer_cfg"] = dict(pos_encoding_on_device=True, pack_mode="dict")
    agents["dict"] = build_agent(cfg)

    results = {}
    for name, agent in agents.items():
        d, f = fetch_ms(agent, obs)
        results[name] = (d, f)
        print(f"{name:>7}: dispatch {d:.1f} ms, blocked fetch {f:.1f} ms", flush=True)

    # device-resident obs: no upload at all — the relay latency floor
    from pointcloud_rl_tpu.algorithms.base import pack_pointcloud_obs

    packed, _ = pack_pointcloud_obs(obs)
    dev_obs = jax.device_put(packed)
    d, f = fetch_ms(agents["full"], dev_obs)
    results["device"] = (d, f)
    print(f" device: dispatch {d:.1f} ms, blocked fetch {f:.1f} ms  (<- RT + exec floor)", flush=True)

    # sanity: same actions from full and nopos (exact path)
    a0 = np.asarray(agents["full"].forward(obs, mode="eval"))
    a1 = np.asarray(agents["nopos"].forward(obs, mode="eval"))
    a2 = np.asarray(agents["f16"].forward(obs, mode="eval"))
    a3 = np.asarray(agents["dict"].forward(obs, mode="eval"))
    print(f"# nopos exact: {np.allclose(a0, a1)}; f16 max|delta|: {np.abs(a2 - a0).max():.2e}; "
          f"dict max|delta|: {np.abs(a3 - a0).max():.2e}")

    # combined headline with the winning transfer config
    best = min(("nopos", "f16", "dict"), key=lambda k: results[k][1])
    print(f"# combined re-run with transfer={best}", flush=True)
    agent = agents[best]
    mem = bench.device_memory()
    if getattr(mem, "transfer_cfg", None) is None:
        mem.transfer_cfg = dict(drop_subkeys=("pos_encoding",))
        mem.storage = None
        mem.reset()
        from __graft_entry__ import _example_batch

        mem.push_batch(_example_batch(2048, n_points, action_dim, seed=0))
    rollout, env_name = bench.make_rollout()
    try:
        for eager in (False, True):
            rollout.eager_push = eager
            for chunk in (16, 32):
                rate, br = bench.measure_combined_rate(agent, rollout, mem, chunk=chunk)
                rate2, _ = bench.measure_combined_rate(agent, rollout, mem, chunk=chunk)
                print(f"combined({env_name}, chunk={chunk}, transfer={best}, eager_push={eager}): "
                      f"{max(rate, rate2):.1f} steps/s split={br}", flush=True)
    finally:
        rollout.close()


if __name__ == "__main__":
    main()
