"""Benchmark harness: combined env + gradient steps/sec, SAC + PointNet.

Measures the BASELINE.md north-star metric on real hardware with the
framework's OWN hot path: `dmc_walker_walk` pointcloud obs (512 pts/frame x 3
stacked frames, batch 256) collected by the pipelined multi-worker Rollout
(NUM_PROCS subprocess MuJoCo envs, grouped so policy-fetch latency overlaps
simulation) with the replay HBM-resident (DeviceReplayMemory) and one
gradient step per env step dispatched as a single lax.scan program per cycle.

Phases reported on stderr (the reference's sim/agent/copy/overhead split):
  1. grad-only   — scanned updates on the HBM replay (device ceiling) + MFU
  2. env-only    — raw vec-env stepping, no policy (host ceiling: this host
                   has ONE CPU core, so worker sims serialize on it)
  3. combined    — the real training loop shape (headline metric)

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: the reference repo publishes no numbers (BASELINE.md); the
denominator is an estimate of the reference CUDA pipeline's combined rate
for this config — torch PointNet [64,128,256] + 1024x1024 heads on
[256, 1536] clouds plus MuJoCo sim+EGL render per step ≈ 40 combined
steps/s on a 2080Ti-class GPU.  Round 3 BOUNDED it with a measurement:
the reference's own torch update runs at 0.039 updates/s on this host's
CPU (tools/measure_reference_cpu.py); scaling by 2080Ti fp32 peak at
30-50% efficiency gives 28-48 updates/s update-only, so 40 combined
steps/s is GENEROUS to the reference (see BASELINE.md "Measured reference
anchor").

Environment context for the combined number (round-3 audit,
tools/exp_overlap.py — predicted-vs-measured agree within ~2%): on the
tunneled relay a program dispatch costs ~2-4 ms of host time but every
blocked action fetch pays ~40-45 ms (the act's own execution + the relay
round trip + any program ahead of it in the device queue).  The combined
loop therefore (a) uses ONE act program per 16-env step (fetch count is
the binding term; fewer fetches beat cross-group sim/fetch overlap), and
(b) enqueues each update chunk BEHIND the act program it follows, so the
fetch never waits on gradient work.  Per 32-step cycle the accounting is
2 fetches x ~43 ms + 32 x ~3.3 ms host sim + ~6 ms dispatches ~= 200 ms
host vs 2 x ~85 ms update-scan device time: measured 117 steps/s combined
against a 122 steps/s sweep best.  On a locally-attached chip (fetch
~= act execution, microsecond dispatch) the same pipeline pencils out at
~min(env, grad) ~= 190+ steps/s — the residual vs grad-only 196 is pure
relay round-trip latency.

Worker-count sweep (PCRL_BENCH_PROCS): in the round-3 regime (update
5.3 ms, host pack 6-7 ms/act) 16 workers and 32 workers measured equal —
the fetch saving and the sim slowdown cancelled.  Round 4 changed both
terms: pack-mode updates run 2.9-3.3 ms (the device stopped being the
binding side) and the host cuts below freed ~1 ms/step of 1-core CPU, so
the fetch amortization now wins: 32 workers measure 173-175 steps/s vs
146-151 at 16 (medians of 3 windows, same session).  32 is the default.

Round-4 host-path cuts (cProfile of the combined loop, tools/tpu_repl.py
drives the experiments): single-pass act pack (slice-assign into the wire
dtype instead of concat(f32)+astype(f16), ~6.3 -> ~2 ms/act), no
double-copy in step_dict_async (fancy-index already copies), zero-copy
slice views for the act obs gather, and the replay push strips the
constant pos_encoding block host-side and re-synthesizes it inside the
jitted device packer (~30% of push relay bytes).  Per-fetch floor is
~25 ms for ANY payload (measured: asarray / device_get / bg-thread all
equal; is_ready sleep-polling doubles it) — on a 1-core host the fetch
cannot hide behind sim (dispatching sim IS sim: the write wakes the
worker which preempts the dispatcher), so fewer+bigger act rounds are
the only lever on the fetch term.
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
import os as _os

NUM_PROCS = int(_os.environ.get("PCRL_BENCH_PROCS", "32"))
PIPELINE_GROUPS = int(_os.environ.get("PCRL_BENCH_GROUPS", "2"))
# Round-4 sweep (post host cuts, medians of 3): procs=32 groups=2 chunk=32
# 174.9 ~= groups=1 173.1 (within relay noise; groups=2 kept — it matches
# the Rollout default and had the higher median); procs=16 stays 146-151.
# PCRL_BENCH_PROCS: worker-count override for shape sweeps — the ~43 ms
# blocked action fetch amortizes over num_procs env steps, so larger worker
# pools trade per-step relay tax against update-scan backlog (the sweep in
# tools/exp_overlap.py varies this via the same env var).
GRAD_SCAN = NUM_PROCS  # updates per dispatched program; == NUM_PROCS so the
# grad-only phase and the combined phase share ONE compiled scan program
# TPU v5e bf16 peak per chip; the update runs f32 so this denominator is
# conservative (f32 on the MXU is ~1/2 the bf16 rate).
PEAK_FLOPS = 197e12


# PCRL_BENCH_TRANSFER: obs-transfer payload reduction (algorithms/
# obs_transfer.py) — "1"/"pos" drops the constant pos_encoding block from
# act uploads + replay storage (exact), "f16" additionally packs the act
# upload in float16, "dict" ships native per-key leaves.  PCRL_BENCH_EAGER
# flushes replay pushes at act-dispatch time (rollout eager_push).
# Defaults follow the measured round-3 sweep winner (tools/exp_fetch.py on
# v5e: blocked fetch full 36.8 / nopos 35.7 / f16 30.4 / dict 32.6 ms vs a
# 26.4 ms device floor; combined f16+eager 135.4 vs 124.3 steps/s).
# "pack" (round 4, the default): f16 act uploads PLUS replay pack_features
# storage — the replay stores the glued channel-last bf16 model-input tensor
# so the update's obs prep collapses to the sampling gather (profile-driven:
# tools/exp_update_profile.py measured ~40% of update device time in
# per-sample obs prep).  Measured on v5e: grad-only 199 (f16) -> 305-341
# (pack) updates/s; combined 139 -> 146 steps/s.
TRANSFER = _os.environ.get("PCRL_BENCH_TRANSFER", "pack")
EAGER_PUSH = _os.environ.get("PCRL_BENCH_EAGER", "1") == "1"
# PCRL_BENCH_LAG=1 (default): SEED-RL-style pipelined acting (rollout
# action_lag) — each group-step applies the action dispatched at the
# previous step, so the blocked device->host action fetch (~25-48 ms on
# the tunneled relay, THE binding term of the combined loop per the relay
# audit) overlaps env simulation instead of serializing before it.  The
# behavior policy is pi∘(one-step delay): off-policy-sound (the replay
# stores the actions actually applied); set 0 for exact reference timing.
ACTION_LAG = int(_os.environ.get("PCRL_BENCH_LAG", "1"))
# PCRL_BENCH_SERVER_OBS=1: workers emit raw render products and ONE jitted
# program per batch unprojects+downsamples them (env/server_env.py, the
# reference ServerBasedVectorEnv analogue) instead of per-worker host
# pointcloud assembly.  Measured round 4 and OFF by default: on the
# TUNNELED single chip the raw rgb+depth batches ride the relay and every
# fused batch pays a blocking device->host fetch — env-only 337.9 -> 70.7
# steps/s, combined 146 -> 53.6 (sim 3.5 -> 18.0 ms/step).  The path is
# built for co-located accelerators where renders are device-resident
# (reference vec_env.py:562-742 assumes a GPU RenderServer); keep it for
# that topology, don't default to it behind a relay.
SERVER_OBS = _os.environ.get("PCRL_BENCH_SERVER_OBS", "0") == "1"


def build_agent():
    from __graft_entry__ import _agent_cfg

    from pointcloud_rl_tpu.algorithms import build_agent as _build

    cfg = _agent_cfg(N_POINTS, ACTION_DIM, fused=True)  # round-3 Pallas body:
    # streaming bf16 forward (max-only for undifferentiated encodes) +
    # winner-gather backward — 6.60 vs 8.04 ms/update against the XLA body
    # at these shapes (scan-16, measured on v5e)
    cfg["batch_size"] = BATCH
    cfg["bf16"] = True  # mixed precision: bf16 matmuls, f32 LN/params/losses
    # (88.6 -> 145.7 updates/s on v5e at these shapes)
    # The shipped TPU-tuned configs (configs/_base_/sac_agent.py) opt into
    # the stale-actor-feature speedup (actor reuses the critic step's visual
    # features, one Adam step stale — the setting walker_walk trained
    # under); bench measures that same path.  The library DEFAULT is False
    # (exact reference ordering, golden-tested).
    cfg["stale_actor_feature"] = True
    if TRANSFER in ("1", "pos"):
        cfg["obs_transfer_cfg"] = dict(pos_encoding_on_device=True)
    elif TRANSFER in ("f16", "pack"):
        cfg["obs_transfer_cfg"] = dict(pos_encoding_on_device=True, pack_dtype="float16")
    elif TRANSFER == "dict":
        cfg["obs_transfer_cfg"] = dict(pos_encoding_on_device=True, pack_mode="dict")
    return _build(cfg)


def build_drq_agent():
    """The DrQ/pn_shift update shape (reference configs/mfrl/drq/dm_control/
    pn_shift.py): num_aug=2 GlobalRotScaleTrans inside the jitted update —
    the K-fold repeat is the dominant extra FLOPs in half the reference's
    configs, so its update rate is tracked alongside the SAC headline
    (VERDICT r4 #7: an aug-path regression must be visible in BENCH_r*)."""
    from __graft_entry__ import _agent_cfg

    from pointcloud_rl_tpu.algorithms import build_agent as _build

    cfg = _agent_cfg(N_POINTS, ACTION_DIM, fused=True)
    cfg["batch_size"] = BATCH
    cfg["bf16"] = True
    cfg["stale_actor_feature"] = True
    cfg.update(
        type="DrQ", num_aug=2, svea=False,
        obs_aug=dict(type="GlobalRotScaleTrans", main_key="xyz", req_keys=["xyz"],
                     rot_range=None, scale_ratio_range=None,
                     translation_range=[0.04, 0, 0.04], shift_height=True),
    )
    # pack_features storage: the shift aug is xyz-only so DrQ augments the
    # packed tensor's xyz channels in-jit (apply_augs_to_packed; mirrors
    # configs/mfrl/drq/dm_control/pn_shift_tpu.py — 81 -> ~200 updates/s)
    cfg["obs_transfer_cfg"] = dict(pos_encoding_on_device=True, pack_dtype="float16")
    return _build(cfg)


def drq_device_memory(capacity=2048, fill=1024):
    from __graft_entry__ import _example_batch

    from pointcloud_rl_tpu.env import DeviceReplayMemory

    mem = DeviceReplayMemory(
        capacity=capacity, seed=0,
        keys=["obs", "next_obs", "actions", "rewards", "dones", "episode_dones"],
        transfer_cfg=dict(pack_features=True),
    )
    mem.push_batch(_example_batch(fill, N_POINTS, ACTION_DIM, seed=0))
    return mem


def measure_drq_rate(drq, mem, scan=16):
    """Scanned DrQ updates/s (aug happens inside the jitted scan body)."""
    np.asarray(drq.update_parameters_scan(mem, scan))  # compile + warm
    best = 0.0
    for _ in range(2):
        t0 = time.monotonic()
        loops = 4
        vec = None
        for _ in range(loops):
            v = drq.update_parameters_scan(mem, scan)
            vec = v if vec is None else vec + v
        vec = np.asarray(vec)
        assert np.isfinite(vec).all()
        best = max(best, loops * scan / (time.monotonic() - t0))
    return best


def device_memory(capacity=4096, fill=2048):
    from __graft_entry__ import _example_batch

    from pointcloud_rl_tpu.env import DeviceReplayMemory

    # keys filter: rollout transitions carry extra keys (prev_actions,
    # worker_indices) the update never reads; keep storage to the SAC batch.
    mem = DeviceReplayMemory(
        capacity=capacity, seed=0,
        keys=["obs", "next_obs", "actions", "rewards", "dones", "episode_dones"],
        transfer_cfg=(
            dict(pack_features=True) if TRANSFER == "pack"
            else dict(drop_subkeys=("pos_encoding",)) if TRANSFER in ("1", "pos", "f16", "dict")
            else None
        ),
    )
    mem.push_batch(_example_batch(fill, N_POINTS, ACTION_DIM, seed=0))
    return mem


def measure_grad_rate(agent, mem):
    """Scanned updates: one dispatch per GRAD_SCAN gradient steps.
    Best-of-two: the tunneled runtime's first measured window often carries
    staging effects worth ~30-50% (observed 101-153 updates/s for identical
    programs)."""
    np.asarray(agent.update_parameters_scan(mem, GRAD_SCAN))  # compile + warm
    # NB: sync points fetch the metric vector (np.asarray) — on the tunneled
    # runtime block_until_ready can return before execution completes.
    best = 0.0
    for _ in range(2):
        t0 = time.monotonic()
        loops = 8
        vec = None
        for _ in range(loops):
            v = agent.update_parameters_scan(mem, GRAD_SCAN)
            vec = v if vec is None else vec + v
        vec = np.asarray(vec)
        assert np.isfinite(vec).all()
        best = max(best, loops * GRAD_SCAN / (time.monotonic() - t0))
    return best


def update_flops(agent, mem):
    """XLA's own cost analysis of the fused sample+update program.

    NOTE: cost analysis cannot see inside pallas_call kernels, so with the
    fused PointNet (the default) the per-update FLOP count — and therefore
    the printed MFU — is a LOWER bound (~92 vs ~144 GFLOP counted on the
    pure-XLA path)."""
    import jax

    from pointcloud_rl_tpu.utils.flops import cost_analysis

    try:
        if agent._storage_update_jit is None:
            agent._storage_update_jit = agent._build_storage_update()
        lowered = agent._storage_update_jit.lower(agent.train_state, mem.storage, mem.device_size)
        return float(lowered.compile().cost_analysis().get("flops", float("nan")))
    except Exception:
        return float("nan")


def make_rollout():
    from pointcloud_rl_tpu.env import Rollout

    env_cfg = dict(type="gym", env_name="dmc_walker_walk-v0", obs_mode="pointcloud", stack_frame=3)
    if SERVER_OBS:
        env_cfg["server_obs"] = True
    try:
        return Rollout(env_cfg=env_cfg, num_procs=NUM_PROCS, base_seed=0,
                       pipeline_groups=PIPELINE_GROUPS, eager_push=EAGER_PUSH,
                       action_lag=ACTION_LAG), "dmc_walker_walk"
    except Exception as e:
        print(f"# walker env unavailable ({type(e).__name__}: {e}); falling back to DistEnv", file=sys.stderr)
        env_cfg = dict(type="gym", env_name="reacher3d_easy-v0", obs_mode="pointcloud")
        return Rollout(env_cfg=env_cfg, num_procs=NUM_PROCS, base_seed=0,
                       pipeline_groups=PIPELINE_GROUPS, eager_push=EAGER_PUSH,
                       action_lag=ACTION_LAG), "dist_env"


def measure_env_rate(rollout, steps=256):
    """Raw host stepping ceiling: fixed actions, no policy, no replay."""
    vec = rollout.vec_env
    actions = np.stack([vec.single_action_space.sample() for _ in range(vec.num_envs)]).astype(np.float32)
    vec.step_dict(actions)  # warm
    t0 = time.monotonic()
    n = 0
    while n < steps:
        vec.step_dict(actions)
        n += vec.num_envs
    return n / (time.monotonic() - t0)


def measure_combined_rate(agent, rollout, mem, cycles=8, steps_per_env=2, chunk=8):
    """The training-loop shape at n_steps=n_updates=1 per env step: each
    cycle collects ``steps_per_env * num_envs`` env steps with the pipelined
    rollout and dispatches the SAME number of gradient steps as scan(chunk)
    programs slotted into the device queue mid-collection (update_hook), so
    acts and updates interleave instead of serializing."""
    n = rollout.num_envs * steps_per_env
    assert chunk <= n, f"chunk ({chunk}) must fit in a cycle of {n} steps"
    events = steps_per_env * rollout.pipeline_groups
    stride = max(1, events * chunk // n)
    rollout.forward_with_policy(agent, rollout.num_envs, mem)  # compile act path
    np.asarray(agent.update_parameters_scan(mem, chunk))  # compile scan(chunk)
    rollout.timer.reset()
    t0 = time.monotonic()
    vec = None

    for _ in range(cycles):
        state = {"ev": 0, "done": 0}

        def hook():
            nonlocal vec
            state["ev"] += 1
            if state["ev"] % stride == 0 and state["done"] + chunk <= n:
                v = agent.update_parameters_scan(mem, chunk)
                vec = v if vec is None else vec + v
                state["done"] += chunk
        rollout.forward_with_policy(agent, n, mem, update_hook=hook)
        while state["done"] + chunk <= n:  # flush any remainder
            v = agent.update_parameters_scan(mem, chunk)
            vec = v if vec is None else vec + v
            state["done"] += chunk
    vec = np.asarray(vec)
    dt = time.monotonic() - t0
    assert np.isfinite(vec).all()
    t = rollout.timer.todict()
    breakdown = {k: round(t.get(k, 0.0), 2) for k in ("simulation", "agent", "copy")}
    return cycles * n / dt, breakdown


def measure_combined_fused(agent, rollout, mem, cycles=8, steps_per_env=2, chunk=8):
    """The training-loop shape with ACT-FUSED updates: each worker-group act
    program carries ``chunk`` gradient steps (set_fused_updates), so a cycle
    costs one dispatch + one fetch per group-step — no separate update
    dispatches to head-of-line block the action fetches."""
    n = rollout.num_envs * steps_per_env
    # compile both programs outside the timed window
    rollout.forward_with_policy(agent, rollout.num_envs, mem)
    assert agent.set_fused_updates(mem, chunk, chunk)
    rollout.forward_with_policy(agent, rollout.num_envs, mem)
    agent.finish_fused_updates()
    np.asarray(agent.update_parameters_scan(mem, chunk))
    rollout.timer.reset()
    t0 = time.monotonic()
    vec, count = None, 0
    for _ in range(cycles):
        agent.set_fused_updates(mem, chunk, n)
        rollout.forward_with_policy(agent, n, mem)
        v, done = agent.finish_fused_updates()
        if v is not None:
            vec = v if vec is None else vec + v
            count += done
        while done + chunk <= n:  # flush to exactly n updates per cycle
            v = agent.update_parameters_scan(mem, chunk)
            vec = v if vec is None else vec + v
            done += chunk
            count += chunk
    vec = np.asarray(vec)
    dt = time.monotonic() - t0
    assert np.isfinite(vec).all() and count >= cycles * (n - chunk)
    t = rollout.timer.todict()
    breakdown = {k: round(t.get(k, 0.0), 2) for k in ("simulation", "agent", "copy")}
    return cycles * n / dt, breakdown


def audit_relay(agent, rollout, mem, reps=12):
    """Measure the relay primitives the combined cycle is built from, so the
    recorded bench tail carries the dispatch/fetch-ms-x-counts accounting
    (VERDICT r2 #1) from the SAME session as the headline number.  Programs
    are already compiled by the combined sweep; costs are medians in ms."""
    obs = rollout.recent_obs
    vec = rollout.vec_env
    np.asarray(agent.forward_async(obs, mode="explore"))  # warm queue empty
    t_disp, t_fetch = [], []
    for _ in range(reps):
        t0 = time.monotonic()
        fut = agent.forward_async(obs, mode="explore")
        t_disp.append(time.monotonic() - t0)
        t0 = time.monotonic()
        np.asarray(fut)
        t_fetch.append(time.monotonic() - t0)
    t_scan = []
    for _ in range(max(3, reps // 4)):
        t0 = time.monotonic()
        np.asarray(agent.update_parameters_scan(mem, GRAD_SCAN))
        t_scan.append(time.monotonic() - t0)
    actions = np.stack([vec.single_action_space.sample()
                        for _ in range(vec.num_envs)]).astype(np.float32)
    t0 = time.monotonic()
    n = 0
    for _ in range(6):
        vec.step_dict(actions)
        n += vec.num_envs
    med = lambda xs: float(np.median(xs) * 1e3)
    return {
        "act_dispatch_ms": round(med(t_disp), 1),
        "act_fetch_ms": round(med(t_fetch), 1),
        "scan_ms_per_update": round(med(t_scan) / GRAD_SCAN, 2),
        "sim_ms_per_env_step": round((time.monotonic() - t0) / n * 1e3, 2),
    }


def _device_reachable(timeout_s: int = 240) -> bool:
    """Probe device discovery in a subprocess with a hard timeout.

    The tunneled relay can die mid-session (observed: the relay daemon
    exiting leaves jax device discovery blocked FOREVER in
    get_default_device) — better to fail fast with a clear message than
    hang the benchmark harness.  Discovery alone is not enough: a wedged
    relay session (observed round 5 after a SIGKILL'd mid-upload client)
    still lists devices but blocks every device->host FETCH forever, so the
    probe also round-trips one tiny array."""
    import subprocess

    probe = ("import jax, jax.numpy as jnp, numpy as np; "
             "jax.devices(); "
             "assert float(np.asarray(jnp.zeros((8, 8))).sum()) == 0.0; "
             "print('ok')")
    try:
        out = subprocess.run(
            [sys.executable, "-c", probe],
            timeout=timeout_s, capture_output=True,
        )
        return b"ok" in out.stdout
    except subprocess.TimeoutExpired:
        return False


def _wait_device_reachable() -> bool:
    """Retry the probe inside a wall-clock budget before declaring failure.

    Wedged relay sessions are TRANSIENT (observed round 5: a session
    wedged by a hard-killed client healed ~30 min later; every new client
    in between blocked on its first fetch).  A single-shot probe turns a
    transient server-side wedge into a failed benchmark round, so retry —
    each attempt is its own subprocess/session — until
    PCRL_BENCH_PROBE_BUDGET_S (default 1500 s) is spent."""
    budget = float(_os.environ.get("PCRL_BENCH_PROBE_BUDGET_S", "1500"))
    deadline = time.monotonic() + budget
    attempt = 0
    while True:
        attempt += 1
        remain = deadline - time.monotonic()
        if _device_reachable(timeout_s=int(min(240, max(60, remain)))):
            return True
        if time.monotonic() >= deadline:
            return False
        print(f"# [{time.strftime('%H:%M:%S')}] probe attempt {attempt} blocked "
              f"(wedged relay session?); retrying — {int(remain)}s of budget left",
              file=sys.stderr, flush=True)
        # Long gap between attempts: a probe killed mid-fetch is itself a
        # hard-killed client — the very thing that wedges sessions — so
        # probing too eagerly can keep re-wedging the relay it is waiting on.
        time.sleep(60)


def main() -> None:
    if not _wait_device_reachable():
        print("# FATAL: jax device discovery/fetch probes hung for the whole "
              "PCRL_BENCH_PROBE_BUDGET_S window — accelerator tunnel down or "
              "relay session wedged; no benchmark numbers can be measured "
              "(NOT printing a stale value)",
              file=sys.stderr)
        sys.exit(2)
    def _stage(msg):
        print(f"# [{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)

    from pointcloud_rl_tpu.utils import enable_compilation_cache

    cache = enable_compilation_cache()  # cold fused-scan compile ~5 min -> seconds when warm
    _stage(f"device reachable (compile cache: {cache or 'off'}); building agent")
    agent = build_agent()
    _stage("agent built; pushing replay to HBM")
    mem = device_memory()
    _stage("replay resident; compiling + measuring grad-only")
    grad_rate = measure_grad_rate(agent, mem)
    _stage(f"grad-only {grad_rate:.1f} updates/s")
    flops_per_update = update_flops(agent, mem)
    grad_mfu = flops_per_update * grad_rate / PEAK_FLOPS

    flops_note = f"{flops_per_update/1e9:.1f} GFLOP/update"
    _stage(f"cost analysis done ({flops_note}); measuring DrQ aug-path updates")
    drq_rate = float("nan")
    try:
        drq = build_drq_agent()
        drq_mem = drq_device_memory()
        drq_rate = measure_drq_rate(drq, drq_mem)
        del drq, drq_mem  # free the second agent's HBM before the rollout phase
        _stage(f"drq (num_aug=2 shift) {drq_rate:.1f} updates/s")
    except Exception as e:  # never let the tracked arm sink the headline
        _stage(f"drq arm failed ({type(e).__name__}: {e}) — recording NaN")
    _stage("building rollout workers")
    rollout, env_name = make_rollout()
    try:
        env_rate = measure_env_rate(rollout)
        _stage(f"env-only {env_rate:.1f} steps/s; compiling combined shapes")
        # The tunneled TPU runtime has pronounced cold-start/staging effects
        # and high run-to-run RT variance (identical configs measured 60-101
        # steps/s across windows); best-of-three of the hooked-scan shape.
        # The act-fused shape (measure_combined_fused) measured consistently
        # slower here (75 vs 96-101: the action fetch waits for its own
        # update chunk) and is excluded; see train_rl's act_fused_updates.
        # chunk 16 vs 32 measure equal within the relay's run-to-run noise;
        # try both and keep the best window (sweep: 104-122 steps/s).
        # chunk candidates scale with the cycle (NUM_PROCS * 2 steps): larger
        # worker pools admit bigger scan programs (fewer dispatches per cycle).
        cycle = NUM_PROCS * 2
        # 64-length scans excluded: a ~200 ms scan program head-of-line
        # blocks the act fetches that land behind it in the device queue
        # (and its cold compile costs ~5 min through the relay).
        chunks = tuple(c for c in (16, 32) if c <= cycle) or (cycle,)
        candidates = []
        for c in chunks:
            candidates.append(measure_combined_rate(agent, rollout, mem, chunk=c))
            _stage(f"combined chunk={c}: {candidates[-1][0]:.1f} steps/s")
        best_i = max(range(len(candidates)), key=lambda i: candidates[i][0])
        best_chunk = chunks[best_i]
        # Sustained rate of the winning shape: relay run-to-run variance is
        # ±15%, so the headline is the MEDIAN over the winning window plus
        # reruns (max-of-N is biased upward; BENCH_r03's best window sat ~9%
        # above its own reruns).  A window is only ~3 s, so four reruns
        # (five windows) cost ~12 s and halve the median's sampling noise vs
        # three windows.  All windows go into the JSON for the record.
        windows = [candidates[best_i]]
        for _ in range(4):
            rerun = measure_combined_rate(agent, rollout, mem, chunk=best_chunk)
            _stage(f"combined chunk={best_chunk} (rerun): {rerun[0]:.1f} steps/s")
            windows.append(rerun)
        windows.sort(key=lambda x: x[0])
        combined, breakdown = windows[len(windows) // 2]
        window_rates = [round(w[0], 2) for w in windows]
        audit = audit_relay(agent, rollout, mem)
    finally:
        rollout.close()

    mfu = flops_per_update * combined / PEAK_FLOPS
    print(
        f"# grad-only: {grad_rate:.1f} step/s (batch {BATCH}, {N_POINTS} pts, HBM replay, "
        f"scan {GRAD_SCAN}/dispatch, {flops_per_update/1e9:.2f} GFLOP/update, MFU {grad_mfu*100:.2f}%) | "
        f"drq_updates_per_sec: {drq_rate:.1f} (num_aug=2 GlobalRotScaleTrans in-jit, batch {BATCH}) | "
        f"env-only ({env_name}, {NUM_PROCS} workers on 1 host core): {env_rate:.1f} step/s | "
        f"combined 1 env + 1 grad: {combined:.1f} step/s (median of windows {window_rates}, "
        f"update MFU {mfu*100:.2f}%), "
        f"rollout time split {breakdown} | relay audit (ms, medians): {audit} — "
        f"per {NUM_PROCS * 2}-step cycle: {2 * PIPELINE_GROUPS} act fetches + {NUM_PROCS * 2} host sim steps "
        f"+ update-scan device time; the gap to grad-only is the blocked-fetch round trip "
        f"(see module docstring / tools/exp_overlap.py)",
        file=sys.stderr,
    )
    print(json.dumps({
        "metric": "SAC+PointNet combined env+grad steps/sec (walker_walk pointcloud, batch 256)",
        "value": round(combined, 2),
        "unit": "steps/s",
        "vs_baseline": round(combined / REFERENCE_COMBINED_STEPS_PER_SEC, 2),
        "windows": window_rates,
        "grad_only_updates_per_sec": round(grad_rate, 2),
        "drq_updates_per_sec": round(drq_rate, 2) if drq_rate == drq_rate else None,
    }))


if __name__ == "__main__":
    main()
