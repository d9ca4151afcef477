"""Sample collection driving vec envs with a policy.

Parity target: reference ``pyrl/env/rollout.py`` — random-action warm-up
(``forward_with_policy(None, n)``), batched policy stepping with per-phase
timers (simulation / agent / copy / overhead) and FPS logging, and a
full-episode mode that caches trajectories until done before pushing
(ManiSkill path).  Host-side mutable state (recent obs, auto-reset) lives in
the vec env; the policy forward is the jitted actor.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Any, Dict, Optional

import numpy as np

from ..utils.logger import get_logger
from ..utils.stats import EpisodicStatistics
from ..utils.timer import Timer
from .builder import ROLLOUTS, build_vec_env


@ROLLOUTS.register_module()
class Rollout:
    def __init__(
        self,
        env_cfg: dict,
        num_procs: int = 1,
        with_info: bool = False,
        full_episode: bool = False,
        base_seed: Optional[int] = None,
        pipeline_groups: Optional[int] = None,
        vec_backend: Optional[str] = None,
        eager_push: bool = False,
        action_lag: int = 0,
        **kwargs,
    ):
        self.vec_env = build_vec_env(env_cfg, num_procs, base_seed=base_seed,
                                     vec_backend=vec_backend)
        self.num_envs = self.vec_env.num_envs
        self.full_episode = full_episode
        self.with_info = with_info
        # Pipelined collection: split the envs into groups; while one group's
        # policy fetch is in flight (pure latency on remote devices) the other
        # groups' workers simulate.  None -> 2 groups when there are >=2 envs.
        if pipeline_groups is None:
            pipeline_groups = 2 if self.num_envs >= 2 else 1
        self.pipeline_groups = max(1, min(int(pipeline_groups), self.num_envs))
        # eager_push: flush collected transitions to the replay right after
        # an act DISPATCH instead of once at the end of the collection call —
        # the push's host->device upload then rides the action fetch's idle
        # round-trip window instead of delaying the NEXT act dispatch
        # (remote-relay scheduling; see DESIGN.md §8).
        self.eager_push = bool(eager_push)
        # action_lag=1: SEED-RL-style pipelined acting — each group-step
        # dispatches the act program on the CURRENT obs but applies the
        # action fetched from the PREVIOUS step's dispatch (a_{t+1} =
        # pi(o_{t-1})), so the device->host action fetch (~25-48 ms of pure
        # round-trip latency on a tunneled TPU) overlaps the next env
        # simulation instead of blocking before it.  The behavior policy is
        # pi composed with a one-step delay: the replay stores the actions
        # actually applied, so off-policy updates (SAC/DrQ) remain sound;
        # the one odd action per episode boundary (computed from pre-reset
        # obs) and the one-step policy-parameter staleness are the standard
        # asynchronous-actor trade (SEED RL / Sample Factory).  Default 0 =
        # exact reference semantics.
        self.action_lag = int(action_lag)
        assert self.action_lag in (0, 1), "only action_lag in {0, 1} is supported"
        self._lag_futures: Dict[int, Any] = {}  # group -> in-flight act future
        self.timer = Timer()
        self.logger = get_logger("pcrl.rollout")
        self.episode_stats = EpisodicStatistics(self.num_envs)
        self.vec_env.reset()

    @property
    def recent_obs(self):
        return self.vec_env.recent_obs

    def reset(self, **kwargs):
        self._lag_futures.clear()  # lagged actions were computed on pre-reset obs
        return self.vec_env.reset(**kwargs)

    def random_action(self):
        return self.vec_env.random_actions()

    def forward_with_policy(self, pi, num: int, replay=None, on_policy: bool = False,
                            update_hook=None, recent_replay=None) -> Dict[str, Any]:
        """Collect ``num`` env steps; push transitions into ``replay``.

        pi=None -> uniform random actions built in-env (warm-up,
        reference rollout.py:54-65).  Returns the last collected batch dict
        plus timing info under "_stats".

        ``recent_replay``: optional second buffer receiving EVERY collected
        transition (reference train_rl.py:281-283 pushes all trajectories of
        the iteration into recent_traj_replay; the caller resets it each
        print period per train_rl.py:264-265).

        ``update_hook`` (pipelined path only): called once after each group
        completes a step — the training loop uses it to DISPATCH gradient
        updates mid-collection, so update programs interleave with the act
        programs in the device queue instead of serializing after the whole
        collection (the device is otherwise idle while env workers
        simulate).
        """
        self.timer.reset()
        if pi is None:
            assert replay is not None
            ret = self.vec_env.step_random_actions(num)
            replay.push_batch(ret)
            if recent_replay is not None:
                recent_replay.push_batch(ret)
            # Episode accounting for the warm-up transitions (row-wise; the
            # batch is grouped per worker so per-worker accumulation holds).
            rewards = np.asarray(ret["rewards"]).reshape(-1)
            dones = np.asarray(ret["episode_dones"]).reshape(-1)
            widx = np.asarray(ret["worker_indices"]).reshape(-1)
            infos = ret.get("infos")
            for j, (r, d, w) in enumerate(zip(rewards, dones, widx)):
                self.episode_stats.push_single(int(w), float(r), bool(d), infos=infos, row=j)
            self.episode_stats.reset_current()  # random-path episodes ended by env resets
            self.timer.tick("simulation")
            return {"_stats": self._stats(num)}

        if self.full_episode:
            return self._forward_full_episodes(pi, num, replay, recent_replay=recent_replay)

        assert num % self.num_envs == 0, (
            f"num ({num}) must be divisible by num_envs ({self.num_envs}) for synchronized stepping"
        )
        can_pipeline = (
            (self.pipeline_groups > 1 or update_hook is not None or self.action_lag)
            and hasattr(pi, "forward_async")
            and not getattr(getattr(pi, "model", None), "is_recurrent", False)
        )
        if can_pipeline:
            return self._forward_pipelined(pi, num, replay, update_hook=update_hook,
                                           recent_replay=recent_replay)
        steps = num // self.num_envs
        last = None
        for _ in range(steps):
            self.timer.skip()
            actions = pi(self.recent_obs, mode="explore")
            self.timer.tick("agent")
            trans = self.vec_env.step_dict(np.asarray(actions))
            self.timer.tick("simulation")
            if hasattr(pi, "reset_rnn_states") and trans["episode_dones"].any():
                pi.reset_rnn_states(trans["episode_dones"])
            self.episode_stats.push(trans["rewards"][:, 0], trans["episode_dones"][:, 0], trans.get("infos"))
            if replay is not None:
                replay.push_batch(trans)
            if recent_replay is not None:
                recent_replay.push_batch({k: v for k, v in trans.items() if k != "infos"})
            self.timer.tick("copy")
            last = trans
        if last is not None:
            last = dict(last)
            last["_stats"] = self._stats(num)
        return last

    def _forward_pipelined(self, pi, num: int, replay, update_hook=None,
                           recent_replay=None) -> Dict[str, Any]:
        """Grouped pipelined collection (reference rollout.py:144-181
        step_async + partial_forward, redesigned for a remote accelerator).

        The per-group dependency chain act->step->obs is strict, so overlap
        comes from running the G groups' chains against each other: while one
        group's action fetch is in flight (~tens of ms of pure round-trip
        latency on a tunneled TPU, nearly zero host CPU), the other groups'
        env workers simulate, and vice versa.  A non-blocking event loop
        (jax.Array.is_ready + pipe polls) services whichever group is ready.

        Per-group timing attribution: 'agent' counts blocked action fetches,
        'simulation' blocked step waits, 'copy' replay pushes.
        """
        import time as _time

        import numpy as np  # noqa: F811 (local for speed in the loop)

        from ..utils.tree_ops import tree_map

        steps_per_env = num // self.num_envs
        groups = np.array_split(np.arange(self.num_envs), self.pipeline_groups)
        NEED_ACT, ACT_PENDING, SIMULATING, DONE = range(4)
        state = [NEED_ACT] * len(groups)
        remaining = [steps_per_env] * len(groups)
        futures: Dict[int, Any] = {}
        collected: list = []  # transitions buffered for ONE replay push at the end
        last = None
        t_agent = t_sim = t_copy = 0.0

        def _obs_of(idx):
            # groups are contiguous ranges (array_split over arange): a
            # basic slice returns zero-copy VIEWS, which is safe here — the
            # act path packs/uploads the obs before recent_obs next mutates
            # (fancy-index copies cost ~1 ms/act of 1-core host time).
            sl = slice(int(idx[0]), int(idx[-1]) + 1)
            return tree_map(lambda x: x[sl], self.vec_env.recent_obs)

        def _flush(t0):
            nonlocal t_copy
            from ..utils.tree_ops import tree_concat

            batch = collected[0] if len(collected) == 1 else tree_concat(collected, 0)
            collected.clear()
            if replay is not None:
                replay.push_batch(batch)
            if recent_replay is not None:
                recent_replay.push_batch(batch)
            t_copy += _time.monotonic() - t0

        def _finish(g, idx, block: bool):
            nonlocal last, t_sim
            t0 = _time.monotonic()
            if not block and not self.vec_env.step_dict_poll(idx=idx):
                return False
            trans = self.vec_env.step_dict_wait(idx=idx)
            t_sim += _time.monotonic() - t0
            for rank, w in enumerate(idx):
                self.episode_stats.push_single(
                    int(w), float(trans["rewards"][rank, 0]), bool(trans["episode_dones"][rank, 0]),
                    infos=trans.get("infos"), row=rank,
                )
            if replay is not None or recent_replay is not None:
                # drop infos before concat (replays skip them; key sets can
                # differ between groups which would break tree_concat)
                collected.append({k: v for k, v in trans.items() if k != "infos"})
            remaining[g] -= 1
            state[g] = NEED_ACT if remaining[g] > 0 else DONE
            last = trans
            return True

        while any(s != DONE for s in state):
            progress = False
            for g, idx in enumerate(groups):
                if state[g] == NEED_ACT:
                    t0 = _time.monotonic()
                    new_fut = pi.forward_async(_obs_of(idx), mode="explore")
                    if self.action_lag:
                        # apply the PREVIOUS dispatch's action (in flight
                        # since before the last sim — its fetch overlapped
                        # that sim); the new dispatch becomes next step's.
                        # The pending future persists across collection
                        # calls (training collects once per cycle).
                        futures[g] = self._lag_futures.get(g, new_fut)
                        self._lag_futures[g] = new_fut
                    else:
                        futures[g] = new_fut
                    t_agent += _time.monotonic() - t0
                    state[g] = ACT_PENDING
                    # Update programs enqueue BEHIND the act just dispatched:
                    # the act's fetch then pays only its own execution + the
                    # round trip, while the update chunk crunches during the
                    # subsequent env simulation.  (Hooking after step-dispatch
                    # instead puts the chunk AHEAD of the next act program,
                    # head-of-line blocking its fetch — measured 89 -> 124
                    # steps/s on the relay for groups=1, chunk=16.)
                    if update_hook is not None:
                        update_hook()
                    if self.eager_push and collected and (replay is not None or recent_replay is not None):
                        _flush(_time.monotonic())
                    progress = True
                elif state[g] == ACT_PENDING and futures[g].is_ready():
                    t0 = _time.monotonic()
                    actions = np.asarray(futures.pop(g))
                    t_agent += _time.monotonic() - t0
                    self.vec_env.step_dict_async(actions, idx=idx)
                    state[g] = SIMULATING
                    progress = True
                elif state[g] == SIMULATING and _finish(g, idx, block=False):
                    progress = True
            if not progress:
                # Nothing ready: block on the most useful dependency rather
                # than spin (act fetches first — they gate new sim work).
                pend = [g for g in range(len(groups)) if state[g] == ACT_PENDING]
                if pend:
                    g = pend[0]
                    t0 = _time.monotonic()
                    actions = np.asarray(futures.pop(g))
                    t_agent += _time.monotonic() - t0
                    self.vec_env.step_dict_async(actions, idx=groups[g])
                    state[g] = SIMULATING
                else:
                    sim = [g for g in range(len(groups)) if state[g] == SIMULATING]
                    assert sim, "pipeline stalled with no pending work"
                    _finish(sim[0], groups[sim[0]], block=True)

        if collected and (replay is not None or recent_replay is not None):
            # ONE batched push per collection call (or the tail the eager
            # flushes didn't cover): a device replay pays one jitted
            # ring-write dispatch instead of one per group-step.
            _flush(_time.monotonic())

        self.timer.add("agent", t_agent)
        self.timer.add("simulation", t_sim)
        self.timer.add("copy", t_copy)
        if last is not None:
            last = dict(last)
            last["_stats"] = self._stats(num)
        return last

    def _forward_full_episodes(self, pi, num: int, replay, recent_replay=None) -> Dict[str, Any]:
        """Cache per-worker trajectories; only full episodes enter the replay
        (reference rollout.py:116-283), with the DD-PPO-style straggler
        cutoff (rollout.py:219-221): once this host has >=80% of its quota
        and at least half of all hosts are done, stop collecting and flush
        partial episodes.  Single-host runs never trigger the vote."""
        import jax

        from ..parallel import DistVar

        multi_host = jax.process_count() > 1
        num_done = DistVar("rollout_num_done") if multi_host else None
        total = 0
        last = None
        while total < num:
            if multi_host and total >= 0.8 * num and num_done.get() >= jax.process_count() / 2:
                total += replay.push_cached_trajectories(max_push=num - total)
                break
            self.timer.skip()
            actions = pi(self.recent_obs, mode="explore")
            self.timer.tick("agent")
            trans = self.vec_env.step_dict(np.asarray(actions))
            self.timer.tick("simulation")
            if hasattr(pi, "reset_rnn_states") and trans["episode_dones"].any():
                pi.reset_rnn_states(trans["episode_dones"])
            self.episode_stats.push(trans["rewards"][:, 0], trans["episode_dones"][:, 0], trans.get("infos"))
            pushed = replay.cache_trajectories(trans, max_push=num - total)
            if recent_replay is not None:
                recent_replay.push_batch({k: v for k, v in trans.items() if k != "infos"})
            total += pushed
            self.timer.tick("copy")
            last = trans
        if multi_host:
            num_done.add(1)
        if last is not None:
            last = dict(last)
            last["_stats"] = self._stats(num)
        return last

    def _stats(self, num: int) -> Dict[str, float]:
        t = self.timer.todict()
        total = max(self.timer.total(), 1e-9)
        stats = {
            "simulation_time": t.get("simulation", 0.0),
            "agent_time": t.get("agent", 0.0),
            "copy_time": t.get("copy", 0.0),
            "overhead_time": max(total - sum(t.values()), 0.0),
            "fps": num / total,
            "num_steps": num,
        }
        return stats

    def close(self):
        self.vec_env.close()
