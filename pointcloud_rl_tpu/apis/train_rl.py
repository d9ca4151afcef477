"""The online off-policy training loop.

Parity target: reference ``pyrl/apis/train_rl.py:128-405`` — warm-up random
steps, then alternate collect(n_steps)/update(n_updates) until total_steps,
with episode statistics, periodic logging (losses + episode stats + timing +
ETA + buffer/memory diagnostics), periodic evaluation, and checkpoints every
n_checkpoint steps as ``models/model_<step>`` plus ``model_final``.  Also
supports on-policy mode (replay reset per iteration) and offline mode
(n_steps=0).
"""

from __future__ import annotations

import os
import os.path as osp
import time
from collections import defaultdict
from typing import Any, Dict, Optional

import numpy as np

from ..utils.checkpoint import save_checkpoint
from ..utils.logger import get_logger
from ..utils.stats import EveryNSteps
from ..utils.timer import format_eta
from ..utils.tree_ops import dict_to_str


def train_rl(
    agent,
    rollout,
    evaluator,
    replay,
    work_dir: str,
    total_steps: int,
    warm_steps: int = 0,
    n_steps: int = 1,
    n_updates: int = 1,
    n_log: int = 1000,
    n_eval: int = -1,
    n_checkpoint: int = -1,
    on_policy: bool = False,
    resume_steps: int = 0,
    eval_num: Optional[int] = None,
    exp_logger=None,
    is_lead: bool = True,
    profile_steps: int = 0,
    save_replay: int = 0,
    ep_stats_cfg: Optional[dict] = None,
    expert_replay=None,
    recent_traj_replay=None,
    stall_timeout: float = 0.0,
    act_fused_updates: bool = False,
) -> None:
    """``save_replay=N``: snapshot the N most recent replay transitions next
    to each checkpoint (models/replay_latest.h5) so auto-resume continues
    with a warm buffer instead of a cold one (the reference loses the
    buffer on resume).

    ``ep_stats_cfg`` configures EpisodicStatistics info-key reductions
    (reference train_rl.py:148,190), e.g.
    ``dict(info_keys_mode=dict(success=[True, "max", "all"]))`` to log
    ManiSkill success rates as ``env/success_mean``.

    ``stall_timeout``: seconds without loop progress before the stall
    watchdog (utils/watchdog.py) declares the device session wedged, marks
    the work dir (STALLED file) and exits nonzero so a supervisor rerunning
    with ``--auto-resume`` continues warm.  0 disables."""
    logger = get_logger("pcrl")
    watchdog = None
    if stall_timeout and stall_timeout > 0:
        from ..utils.watchdog import StallWatchdog

        def _mark_stalled():
            with open(osp.join(work_dir, "STALLED"), "a") as f:
                f.write(f"{time.time()}\n")

        watchdog = StallWatchdog(stall_timeout, on_stall=_mark_stalled)
    if expert_replay is not None:
        # Demo/expert dataset exposure (reference train_rl.py:295): agents
        # with demo-augmented objectives read ``agent.expert_replay`` inside
        # their update; plain SAC/DrQ ignore it.
        agent.expert_replay = expert_replay
        logger.info(f"Expert replay attached: {len(expert_replay)} transitions"
                    + (" (dynamic)" if getattr(expert_replay, "dynamic_loading", False) else ""))
    if ep_stats_cfg and rollout is not None:
        from ..utils.stats import EpisodicStatistics

        rollout.episode_stats = EpisodicStatistics(rollout.num_envs, **ep_stats_cfg)
    if rollout is not None and n_steps > 0 and n_steps % rollout.num_envs != 0:
        # Same contract as the reference (its rollout asserts num % num_envs
        # at collection time, rollout.py:286); failing here names the config
        # knobs instead of surfacing mid-run from the rollout internals.
        raise ValueError(
            f"train_cfg.n_steps ({n_steps}) must be a multiple of the vec-env size "
            f"(rollout_cfg.num_procs = {rollout.num_envs}) for synchronized stepping"
        )
    profiler_active = False
    if profile_steps > 0:
        # Tracing subsystem (SURVEY §5.1): device + host trace of the first
        # N steps, viewable in TensorBoard's profile plugin / Perfetto.
        import jax

        jax.profiler.start_trace(osp.join(work_dir, "profile"))
        profiler_active = True
    log_trigger = EveryNSteps(n_log)
    eval_trigger = EveryNSteps(n_eval if n_eval and n_eval > 0 else None)
    ckpt_trigger = EveryNSteps(n_checkpoint if n_checkpoint and n_checkpoint > 0 else None)

    steps = resume_steps
    total_updates = 0
    log_trigger.reset(steps)
    if eval_trigger.n:
        eval_trigger.reset(steps)
    if ckpt_trigger.n:
        ckpt_trigger.reset(steps)

    begin_time = time.monotonic()
    begin_steps = steps
    metric_sums: Dict[str, float] = defaultdict(float)
    metric_counts: Dict[str, int] = defaultdict(int)
    time_sums: Dict[str, float] = defaultdict(float)
    lazy_vec_sum = None
    lazy_count = 0

    # ---- graceful preemption (SURVEY §5.3) ---------------------------------
    # Schedulers and bounded runs (`timeout N python -m ...run_rl`) stop jobs
    # with SIGTERM; Python's default handler kills the process mid-cycle,
    # losing everything since the last n_checkpoint multiple.  Trap it into a
    # flag, finish the current cycle, save a NUMBERED checkpoint (model_final
    # auto-resumes at step 0 — find_checkpoint needs model_<step>), and exit
    # cleanly so run_rl's finally still tears down workers.  Installed BEFORE
    # the warm-up so a preemption during a long cold-resume refill still
    # checkpoints instead of dying handler-less.
    import signal as _signal

    stop_sig = {"num": None}
    _term_installed = False
    _prev_term = None
    try:
        _prev_term = _signal.signal(
            _signal.SIGTERM, lambda signum, frame: stop_sig.__setitem__("num", signum)
        )
        _term_installed = True
    except ValueError:  # not the main thread (embedded/test callers): skip
        pass

    # ---- warm-up (train_rl.py:207-228) -------------------------------------
    # Fresh runs prefill the buffer with random actions; those steps count
    # into the step counter (reference ``steps = resume_steps + warm_steps``,
    # train_rl.py:230-231).  A COLD RESUME (checkpoint without a replay
    # snapshot — the reference's only resume mode) must also prefill, or the
    # first update cycles overfit a handful of fresh transitions; there the
    # current policy collects the refill.  That refill is buffer maintenance,
    # NOT training progress: it must not advance ``steps`` or it starves the
    # remaining total_steps budget (a resume with total-resume <= warm would
    # perform zero gradient updates).  It is additionally capped at the
    # remaining budget so a near-finished resume doesn't over-collect.
    if warm_steps > 0 and not on_policy and replay is not None and len(replay) == 0:
        assert rollout is not None
        warm_pi = None if resume_steps == 0 else agent
        warm = warm_steps
        if warm_pi is not None:  # policy collection steps all envs together
            warm = min(warm_steps, max(total_steps - resume_steps, 0))
            warm = -(-warm // rollout.num_envs) * rollout.num_envs
        if warm > 0:
            rollout.forward_with_policy(warm_pi, warm, replay)
            if warm_pi is None:
                steps += warm  # fresh-run warm-up consumes budget (reference parity)
                log_trigger.reset(steps)
            kind = "random" if warm_pi is None else "policy refill (cold resume, off-budget)"
            logger.info(f"Warm-up finished: {warm} {kind} steps, buffer size {len(replay)}")
            rollout.episode_stats.reset_current()
    if profiler_active:
        # computed from the ACTUAL post-warm-up step count, so the profiled
        # window covers profile_steps of main-loop progress exactly
        profile_until = steps + profile_steps

    # ---- main loop ---------------------------------------------------------
    # Multi-host: stop_sig is per-host; staggered SIGTERM delivery must not
    # let one host exit the loop a cycle before its peers or the stragglers
    # deadlock in the symmetric allreduce_stats collective below.  Agree on
    # the flag once per cycle.
    def _stop_requested() -> bool:
        if stop_sig["num"] is None and not _stop_agreed["any"]:
            local = 0.0
        else:
            local = 1.0
        import jax

        if jax.process_count() > 1:
            from ..parallel import allreduce_stats

            local = allreduce_stats({"stop": local}, op="max")["stop"]
        if local > 0:
            _stop_agreed["any"] = True
        return _stop_agreed["any"]

    _stop_agreed = {"any": False}
    while steps < total_steps and not _stop_requested():
        if watchdog is not None:
            watchdog.pet()
        iter_t0 = time.monotonic()
        if on_policy and replay is not None:
            replay.reset()
            if rollout is not None:
                rollout.episode_stats.reset_current()

        # Interleaved dispatch: with a pipelined rollout and an HBM-resident
        # replay, gradient-update scans are dispatched DURING collection
        # (right after a worker group's actions ship), so update programs
        # fill the device queue while hosts simulate.  Updates in a cycle
        # sample the buffer as of the previous cycle (the pipelined rollout
        # pushes once at the end) — one-cycle staleness for full overlap.
        updates_dispatched = 0
        update_hook = None
        fused_active = False
        can_interleave = (
            n_steps > 0 and n_updates > 1 and rollout is not None and replay is not None
            and hasattr(agent, "update_parameters_scan")
            and type(replay).__name__ == "DeviceReplayMemory" and len(replay) > 0
            and n_steps % rollout.num_envs == 0
        )
        if can_interleave:
            events = max((n_steps // rollout.num_envs) * rollout.pipeline_groups, 1)
            chunk = max(1, n_updates // events)
            hook_state = {"t": 0.0}
            # Opt-in: act-fused updates — the rollout's explore forwards
            # carry the update chunks inside the act program (one dispatch +
            # one fetch per group-step).  Measured SLOWER than the hooked
            # path on the tunneled v5e (75 vs 96-99 steps/s, _prof8.py):
            # the action fetch waits for its own update chunk, elongating
            # the act->sim critical path more than the saved dispatches
            # recoup — hence default-off, kept for locally-attached chips
            # where dispatch cost dominates fetch latency.
            fused_active = (
                act_fused_updates
                and hasattr(agent, "set_fused_updates")
                and agent.set_fused_updates(replay, chunk, n_updates)
            )

        if can_interleave and not fused_active:
            # Fallback: separate update-scan dispatches interleaved with the
            # rollout via the mid-collection hook.

            def update_hook():
                nonlocal lazy_vec_sum, lazy_count, total_updates, updates_dispatched
                if updates_dispatched + chunk > n_updates:
                    return
                t0 = time.monotonic()
                vec = agent.update_parameters_scan(replay, chunk)
                hook_state["t"] += time.monotonic() - t0
                lazy_vec_sum = vec if lazy_vec_sum is None else lazy_vec_sum + vec
                lazy_count += chunk
                total_updates += chunk
                updates_dispatched += chunk

        if n_steps > 0 and rollout is not None:
            agent.eval()
            # recent_traj_replay receives EVERY transition collected this
            # cycle (reference train_rl.py:281-283) and is reset at each log
            # boundary (the print-period analogue, train_rl.py:264-265).
            out = rollout.forward_with_policy(agent, n_steps, replay, update_hook=update_hook,
                                              recent_replay=recent_traj_replay)
            steps += n_steps
            if out and "_stats" in out:
                for k, v in out["_stats"].items():
                    if k.endswith("_time"):
                        time_sums[k] += v
            time_sums["collect_sample_time"] += time.monotonic() - iter_t0
            if update_hook is not None:
                time_sums["collect_sample_time"] -= hook_state["t"]
                time_sums["update_time"] += hook_state["t"]
        else:
            steps += 1  # offline mode progresses by update counting

        if fused_active:
            # Collect the device metric-vec sum the act-fused dispatches
            # accumulated during the rollout; the remainder (if the rollout
            # issued fewer explore forwards than planned) flushes below.
            vec, done = agent.finish_fused_updates()
            if vec is not None:
                lazy_vec_sum = vec if lazy_vec_sum is None else lazy_vec_sum + vec
                lazy_count += done
                total_updates += done
            updates_dispatched += done

        n_updates_left = n_updates - updates_dispatched
        update_t0 = time.monotonic()
        agent.train()
        if update_hook is not None or fused_active:
            if n_updates_left > 0:  # flush the remainder the hook didn't cover
                vec = agent.update_parameters_scan(replay, n_updates_left)
                lazy_vec_sum = vec if lazy_vec_sum is None else lazy_vec_sum + vec
                lazy_count += n_updates_left
                total_updates += n_updates_left
        elif hasattr(agent, "update_parameters_scan") and n_updates > 1:
            # All n_updates gradient steps in ONE dispatched device program
            # (lax.scan over the fused sample+update) — one round trip per
            # iteration instead of one per update on remote devices.
            total_updates += n_updates
            vec = agent.update_parameters_scan(replay, n_updates)
            lazy_vec_sum = vec if lazy_vec_sum is None else lazy_vec_sum + vec
            lazy_count += n_updates
        elif hasattr(agent, "update_parameters_lazy"):
            # Lazy path: metric vectors accumulate ON DEVICE; nothing syncs
            # until log time, so updates overlap with env stepping.
            for _ in range(n_updates):
                total_updates += 1
                vec = agent.update_parameters_lazy(replay, total_updates)
                lazy_vec_sum = vec if lazy_vec_sum is None else lazy_vec_sum + vec
                lazy_count += 1
        else:
            for _ in range(n_updates):
                total_updates += 1
                metrics = agent.update_parameters(replay, total_updates)
                for k, v in metrics.items():
                    metric_sums[k] += float(v)
                    metric_counts[k] += 1
        time_sums["update_time"] += time.monotonic() - update_t0

        if profiler_active and steps >= profile_until:
            import jax

            jax.profiler.stop_trace()
            profiler_active = False
            logger.info(f"Profiler trace written to {osp.join(work_dir, 'profile')}")

        # ---- logging (train_rl.py:315-371) ---------------------------------
        # allreduce_stats is a symmetric collective: EVERY host must enter it
        # at each log boundary or the lead blocks forever; only the actual
        # writes below are lead-gated.
        if log_trigger.check(steps):
            if lazy_vec_sum is not None:
                avg_metrics = agent.reduce_metric_vecs(lazy_vec_sum, lazy_count)  # ONE device fetch
                lazy_vec_sum, lazy_count = None, 0
            else:
                avg_metrics = {k: metric_sums[k] / max(metric_counts[k], 1) for k in metric_sums}
            env_stats = rollout.episode_stats.get_stats() if rollout is not None else {}
            if rollout is not None:
                rollout.episode_stats.reset_history()
            if env_stats:
                # cross-host episode statistics (reference GDict.allreduce,
                # train_rl.py:315-347); identity on a single host
                from ..parallel import allreduce_stats

                env_stats = allreduce_stats(env_stats, op="mean")
            elapsed = time.monotonic() - begin_time
            rate = (steps - begin_steps) / max(elapsed, 1e-9)
            eta = format_eta((total_steps - steps) / max(rate, 1e-9))
            from ..utils.process import get_total_memory_mb

            diag = {
                "buffer_size": len(replay) if replay is not None else 0,
                "total_grad_steps": total_updates,
                "samples_per_sec": rate,
                "memory_mb": get_total_memory_mb(),
                **{k: v for k, v in time_sums.items()},
            }
            line = (
                f"{steps}/{total_steps} ({steps / total_steps * 100:.0f}%) ETA {eta} | "
                + dict_to_str({**env_stats, **avg_metrics})
                + " | "
                + dict_to_str(diag)
            )
            if is_lead:
                logger.info(line)
                if exp_logger is not None:
                    exp_logger.log({**env_stats, **avg_metrics, **diag}, step=steps, tag="train")
            metric_sums.clear()
            metric_counts.clear()
            time_sums.clear()
            if recent_traj_replay is not None:
                recent_traj_replay.reset()  # reference train_rl.py:264-265

        # ---- evaluation (train_rl.py:373-390) -------------------------------
        if evaluator is not None and eval_trigger.n and eval_trigger.check(steps) and is_lead:
            std_step = eval_trigger.standard(steps)
            agent.eval()
            eval_dir = osp.join(work_dir, f"eval_{std_step}")
            if watchdog is not None:
                watchdog.pause()  # first eval can sit in compile for 10+ min
            lens, rewards, finishes = evaluator.run(agent, num=eval_num, work_dir=eval_dir)
            if watchdog is not None:
                watchdog.resume()
            if exp_logger is not None:
                exp_logger.log(
                    {
                        "rewards_mean": float(np.mean(rewards)),
                        "lengths_mean": float(np.mean(lens)),
                        "success_rate": float(np.mean(finishes)),
                    },
                    step=std_step,
                    tag="test",
                )

        # ---- checkpoint (train_rl.py:392-405) --------------------------------
        if ckpt_trigger.n and ckpt_trigger.check(steps) and is_lead:
            std_step = ckpt_trigger.standard(steps)
            path = save_checkpoint(agent.state_dict(), work_dir, std_step)
            logger.info(f"Saved checkpoint at step {std_step}: {path}")
            if save_replay and save_replay > 0 and replay is not None and hasattr(replay, "tail"):
                from ..env.replay import ReplayMemory as _HostReplay

                snap = _HostReplay(capacity=min(save_replay, len(replay)))
                snap.push_batch(replay.tail(min(save_replay, len(replay))))
                # write-then-rename: a crash mid-write must not corrupt the
                # previous snapshot (it is the warm-resume insurance).
                dst = osp.join(work_dir, "models", "replay_latest.h5")
                snap.to_hdf5(dst + ".tmp", compression="lzf")
                os.replace(dst + ".tmp", dst)
                logger.info(f"Saved replay snapshot ({len(snap)} transitions)")

    if watchdog is not None:
        watchdog.stop()
    if profiler_active:
        import jax

        jax.profiler.stop_trace()
    preempted = _stop_agreed["any"] and steps < total_steps
    if is_lead and preempted:
        # Preempted: a numbered checkpoint so --auto-resume continues HERE.
        path = save_checkpoint(agent.state_dict(), work_dir, steps)
        logger.info(f"SIGTERM at {steps} steps; preemption checkpoint: {path}")
    if is_lead:
        path = save_checkpoint(agent.state_dict(), work_dir, steps, name="model_final")
        logger.info(f"Training finished at {steps} steps; final checkpoint: {path}")
    # Restore the previous disposition only AFTER the preemption/final saves:
    # schedulers and `timeout -k` commonly deliver a second TERM, which must
    # keep hitting the benign flag-setter until the checkpoints are on disk.
    if _term_installed:
        _signal.signal(_signal.SIGTERM, _prev_term if _prev_term is not None else _signal.SIG_DFL)
