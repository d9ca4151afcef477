"""Soft Actor-Critic as a single jitted update step.

Parity target: reference ``pyrl/methods/mfrl/sac.py`` — twin-Q targets with
entropy bonus, MSE critic loss x num_q, interval-gated actor/alpha/target
updates, automatic alpha tuning against a target entropy (label-smoothed for
discrete actions), shared visual backbone with detached actor features and
critic-side backbone training, and per-path regex EMA coefficients.

TPU design: the whole update (critic + actor + alpha + target EMA) is ONE
jitted pure function over a train-state pytree; interval gating uses
``lax.cond`` on an in-state counter, so n_updates gradient steps run without
host round-trips.  Under a data-parallel mesh the same function is jitted
with sharded batch inputs and XLA inserts the gradient all-reduce.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Optional

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from ..models import build_actor_critic
from ..ops.augment import build_data_augmentations
from . import MFRL
from .base import BaseAgent, example_obs_from_shape
from .optim import build_tau_tree, global_grad_norm, make_optimizer, soft_update


@flax.struct.dataclass
class SACState:
    params: Any
    target_params: Any
    log_alpha: jnp.ndarray
    actor_opt: Any
    critic_opt: Any
    alpha_opt: Any
    rng: jax.Array
    updates: jnp.ndarray  # int32 gradient-step counter


@MFRL.register_module()
class SAC(BaseAgent):
    def __init__(
        self,
        actor_cfg,
        critic_cfg,
        env_params,
        batch_size=128,
        gamma=0.99,
        reward_scale=1,
        update_coeff=0.005,
        alpha=0.2,
        alpha_optim_cfg=None,
        automatic_alpha_tuning=True,
        target_entropy=None,
        ignore_dones=False,
        use_episode_dones=False,
        target_update_interval=1,
        actor_update_interval=1,
        shared_backbone=False,
        shared_target_backbone=None,
        detach_actor_feature=False,
        target_smooth=0.90,
        pre_process=None,
        obs_rms: bool = False,
        seed: int = 0,
        metric_prefix: str = "sac",
        bf16: bool = False,
        stale_actor_feature: bool = False,
        obs_transfer_cfg: Optional[dict] = None,
    ):
        super().__init__()
        self.init_obs_transfer(obs_transfer_cfg, env_params["obs_shape"])
        self.is_discrete = bool(env_params["is_discrete"])
        self.batch_size = batch_size
        self.gamma = float(gamma)
        self.reward_scale = float(reward_scale)
        self.ignore_dones = bool(ignore_dones)
        self.use_episode_dones = bool(use_episode_dones)
        self.target_update_interval = int(target_update_interval)
        self.actor_update_interval = int(actor_update_interval)
        self.automatic_alpha_tuning = bool(automatic_alpha_tuning)
        self.shared_backbone = bool(shared_backbone)
        self.detach_actor_feature = bool(detach_actor_feature)
        # Perf/parity trade: the reference actor RE-ENCODES observations
        # under post-critic-step params and reuses its own features for q_pi
        # (sac.py:163-182) — that exact ordering is the DEFAULT
        # (stale_actor_feature=False), the one golden-parity tests pin.
        # stale_actor_feature=True makes the actor reuse the CRITIC
        # forward's features — one Adam step staler, one full visual encode
        # cheaper per actor update (~25% update throughput at walker shapes,
        # bench 196 vs 146 grad steps/s); the TPU-tuned DMC pointcloud
        # configs opt in.  Return-health evidence for the stale path: the
        # full 500k walker_walk protocol run (seed 2000) trained under it to
        # eval 946±26 — reference-level returns (work_dirs/walker_500k/),
        # alongside seed 1000's 809 @100k.
        self.stale_actor_feature = bool(stale_actor_feature)
        self.metric_prefix = metric_prefix
        self.obs_processor = build_data_augmentations(pre_process)
        # Optional host-side observation normalization (reference
        # BaseAgent.process_obs obs RMS; flat-state observations only).
        self.obs_rms = None
        if obs_rms:
            from ..utils.stats import RunningMeanStd

            shape = env_params["obs_shape"]
            assert not isinstance(shape, dict), "obs_rms supports flat state observations"
            self.obs_rms = RunningMeanStd(shape=(shape if isinstance(shape, int) else int(np.prod(shape)),))

        actor_cfg, critic_cfg = dict(actor_cfg), dict(critic_cfg)
        actor_optim_cfg = actor_cfg.pop("optim_cfg", None)
        critic_optim_cfg = critic_cfg.pop("optim_cfg", None)

        # freeze_* flags become optimizer exclusions on BOTH optimizers
        from ..models.builder import extract_freeze_param_cfg

        freeze_cfg = extract_freeze_param_cfg(actor_cfg.get("nn_cfg"))
        if freeze_cfg:
            actor_optim_cfg = dict(actor_optim_cfg or {"type": "Adam", "lr": 3e-4})
            critic_optim_cfg = dict(critic_optim_cfg or {"type": "Adam", "lr": 3e-4})
            for ocfg in (actor_optim_cfg, critic_optim_cfg):
                pc = dict(ocfg.get("param_cfg") or {})
                pc.update(freeze_cfg)
                ocfg["param_cfg"] = pc

        self.model = build_actor_critic(
            actor_cfg, critic_cfg, env_params, shared_backbone=self.shared_backbone,
            shared_target_backbone=shared_target_backbone, bf16=bf16,
        )
        action_shape = env_params["action_shape"]

        # ---- target entropy & alpha (sac.py:83-101) ----------------------
        if target_entropy is None:
            if self.is_discrete:
                n = int(np.prod(action_shape))
                explore_rate = (1 - target_smooth) / max(n - 1, 1)
                self.target_entropy = -(
                    target_smooth * np.log(target_smooth) + (n - 1) * explore_rate * np.log(explore_rate)
                )
                init_log_alpha = float(np.log(0.1))
            else:
                self.target_entropy = -float(np.prod(action_shape))
                init_log_alpha = float(np.log(np.float32(alpha)))
        else:
            self.target_entropy = float(target_entropy)
            init_log_alpha = float(np.log(np.float32(alpha)))
        self.target_entropy = float(self.target_entropy)

        # ---- init params --------------------------------------------------
        rng = jax.random.PRNGKey(seed)
        rng, k_init = jax.random.split(rng)
        example_obs = example_obs_from_shape(env_params["obs_shape"], batch=1)
        example_action = (
            np.zeros((1, 1), np.int32) if self.is_discrete else np.zeros((1, int(np.prod(action_shape))), np.float32)
        )
        params = self.model.init_params(k_init, example_obs, example_action)
        target_params = self.model.init_target_params(params)

        # ---- optimizers (masked to the owning subtrees) --------------------
        actor_mask = {
            "actor": True,
            "visual": (not self.shared_backbone) and ("visual" in params),
            "rnn": (not self.shared_backbone) and ("rnn" in params),
        }
        critic_mask = {
            "critic": True,
            "visual": self.shared_backbone and ("visual" in params),
            "rnn": self.shared_backbone and ("rnn" in params),
            "critic_visual": "critic_visual" in params,
        }
        self.actor_tx = make_optimizer(actor_optim_cfg, params, extra_mask=actor_mask)
        self.critic_tx = make_optimizer(critic_optim_cfg, params, extra_mask=critic_mask)
        alpha_cfg = dict(alpha_optim_cfg or {"type": "Adam", "lr": 3e-4})
        alpha_cfg.pop("param_cfg", None)
        self.alpha_tx = make_optimizer(alpha_cfg, {"log_alpha": jnp.zeros(())})
        self.tau_tree = build_tau_tree(update_coeff, target_params)

        self.train_state = SACState(
            params=params,
            target_params=target_params,
            log_alpha=jnp.asarray(init_log_alpha, jnp.float32),
            actor_opt=self.actor_tx.init(params),
            critic_opt=self.critic_tx.init(params),
            alpha_opt=self.alpha_tx.init({"log_alpha": jnp.zeros(())}),
            rng=rng,
            updates=jnp.zeros((), jnp.int32),
        )
        self._metric_keys: Optional[list] = None
        self._update_jit = jax.jit(self._packed_update, donate_argnums=(0,))
        self._storage_update_jit = None  # built lazily for DeviceReplayMemory

    def _packed_update(self, state, batch):
        """Jit wrapper packing metrics into ONE vector: a remote-device fetch
        of a dict of scalars costs one round trip per leaf; one stacked array
        costs one."""
        if self.obs_transfer is not None:
            # Re-attach the transfer-dropped pos_encoding block BEFORE any
            # augmentation (augs may permute/subsample points; completion
            # first keeps the reference channel alignment exact).
            batch = dict(batch)
            for key in ("obs", "next_obs"):
                if isinstance(batch.get(key), dict):
                    batch[key] = self._device_obs(batch[key])
        state, metrics = self._update_step(state, batch)
        keys = sorted(metrics)
        self._metric_keys = keys  # trace-time side effect; keys are static
        return state, jnp.stack([jnp.asarray(metrics[k], jnp.float32) for k in keys])

    # ------------------------------------------------------------------ act
    def _build_act(self, mode: str):
        head_mode = {"eval": "eval", "mean": "eval"}.get(mode, "explore")
        inference_aug = getattr(self, "inference_aug", None)

        if self.model.is_recurrent:

            @jax.jit
            def act_recurrent(state: SACState, obs, rnn_states):
                rng, k_s, k_aug = jax.random.split(state.rng, 3)
                obs = self._device_obs(obs)
                if inference_aug is not None and isinstance(obs, dict):
                    obs = inference_aug(k_aug, obs)
                out, _, next_states = self.model.actor_apply(
                    state.params, obs, mode=head_mode, rng=k_s,
                    rnn_states=rnn_states, rnn_mode="with_states",
                )
                return out, next_states, state.replace(rng=rng)

            return act_recurrent

        @jax.jit
        def act(state: SACState, obs):
            rng, k_s, k_aug = jax.random.split(state.rng, 3)
            obs = self._device_obs(obs)
            if inference_aug is not None and isinstance(obs, dict):
                obs = inference_aug(k_aug, obs)
            out, _ = self.model.actor_apply(state.params, obs, mode=head_mode, rng=k_s)
            return out, state.replace(rng=rng)

        return act

    # -------------------------------------------------------------- update
    def _prepare_batch(self, sampled: Dict[str, Any]) -> Dict[str, Any]:
        batch = dict(sampled)
        if self.use_episode_dones:
            batch["dones"] = batch["episode_dones"]
        if self.obs_rms is not None:
            assert isinstance(batch["obs"], np.ndarray), "obs_rms requires a host replay buffer"
            self.obs_rms.update(batch["obs"])
            batch["obs"] = self.obs_rms.normalize(batch["obs"])
            batch["next_obs"] = self.obs_rms.normalize(batch["next_obs"])
        for key in ("rewards", "dones"):
            arr = batch[key]
            if getattr(arr, "ndim", None) == 1:  # works for np and device arrays
                batch[key] = arr[:, None]
        return batch

    def _build_storage_update(self):
        """Fused sample+update over an HBM-resident replay: ONE device
        program per gradient step (sampling gather inlined into the update),
        which matters on remote/tunneled devices where each program dispatch
        is a round trip."""
        batch_size = self.batch_size
        batch_sharding = getattr(self, "_batch_sharding", None)

        @partial(jax.jit, donate_argnums=(0,))
        def step(state, storage, size):
            # Sampling key derives from the in-state rng (fold_in keeps it
            # distinct from the keys _update_step splits off): no external
            # key argument means no extra host->device transfer per
            # dispatch — each one is a round trip on tunneled runtimes.
            idx = jax.random.randint(jax.random.fold_in(state.rng, 0xFFFF), (batch_size,), 0, size)
            batch = jax.tree_util.tree_map(lambda s: s.at[idx].get(mode="promise_in_bounds"), storage)
            if batch_sharding is not None:
                # Data-parallel mesh: pin the gathered batch onto the data
                # axis so each device materializes only its rows and the
                # update runs sharded with one grad all-reduce.
                batch = jax.lax.with_sharding_constraint(
                    batch, jax.tree_util.tree_map(lambda _: batch_sharding, batch)
                )
            if self.use_episode_dones:
                batch["dones"] = batch["episode_dones"]
            return self._packed_update(state, batch)

        return step

    def _build_storage_update_scan(self):
        """K gradient steps in ONE device program (lax.scan over the fused
        sample+update): per-dispatch host cost and round-trip latency are paid
        once per K updates instead of once per update — on a tunneled TPU the
        dispatch overhead otherwise rivals the compute."""
        batch_size = self.batch_size
        batch_sharding = getattr(self, "_batch_sharding", None)

        @partial(jax.jit, static_argnames=("n",), donate_argnums=(0,))
        def step_n(state, storage, size, n):
            def body(carry, _):
                # per-iteration sampling key from the carried rng (which
                # _update_step refreshes every iteration)
                idx = jax.random.randint(jax.random.fold_in(carry.rng, 0xFFFF), (batch_size,), 0, size)
                batch = jax.tree_util.tree_map(lambda s: s.at[idx].get(mode="promise_in_bounds"), storage)
                if batch_sharding is not None:
                    batch = jax.lax.with_sharding_constraint(
                        batch, jax.tree_util.tree_map(lambda _: batch_sharding, batch)
                    )
                if self.use_episode_dones:
                    batch["dones"] = batch["episode_dones"]
                new_state, vec = self._packed_update(carry, batch)
                return new_state, vec

            state, vecs = jax.lax.scan(body, state, None, length=n)
            return state, vecs.sum(axis=0)

        return step_n

    def update_parameters_scan(self, memory, n: int):
        """Run ``n`` gradient steps as one dispatched program over an
        HBM-resident replay; returns the SUMMED packed metric vector (no host
        sync).  Falls back to ``n`` lazy updates for host replays."""
        from ..env.device_replay import DeviceReplayMemory

        if not (isinstance(memory, DeviceReplayMemory) and not self.model.is_recurrent and self.obs_rms is None):
            vec = None
            for i in range(n):
                v = self.update_parameters_lazy(memory, i)
                vec = v if vec is None else vec + v
            return vec
        if getattr(self, "_storage_scan_jit", None) is None:
            self._storage_scan_jit = self._build_storage_update_scan()
        self.train_state, vec_sum = self._storage_scan_jit(
            self.train_state, memory.storage, memory.device_size, n
        )
        self._inflight = getattr(self, "_inflight", 0) + 1
        if self._inflight >= 16:
            jax.block_until_ready(vec_sum)
            self._inflight = 0
        return vec_sum

    # ----------------------------------------------- act-fused update scans
    def _build_act_update_scan(self):
        """K gradient steps AND the explore-mode act forward in ONE device
        program.  On a tunneled TPU every dispatch costs ~20 ms of host time
        and every device->host fetch ~25 ms of round-trip latency; fusing the
        update chunk into the act program removes the separate update
        dispatch AND the head-of-line blocking where an act program queues
        behind an already-dispatched update scan (measured ~40 ms blocked per
        action fetch vs ~25 ms pure RT).  The actor acts under the
        post-update params — the same ordering as the reference's
        collect-then-update loop observed at chunk granularity."""
        batch_size = self.batch_size
        batch_sharding = getattr(self, "_batch_sharding", None)
        inference_aug = getattr(self, "inference_aug", None)

        @partial(jax.jit, static_argnames=("n",), donate_argnums=(0,))
        def step_n_act(state, storage, size, obs, n):
            def body(carry, _):
                idx = jax.random.randint(jax.random.fold_in(carry.rng, 0xFFFF), (batch_size,), 0, size)
                batch = jax.tree_util.tree_map(lambda s: s.at[idx].get(mode="promise_in_bounds"), storage)
                if batch_sharding is not None:
                    batch = jax.lax.with_sharding_constraint(
                        batch, jax.tree_util.tree_map(lambda _: batch_sharding, batch)
                    )
                if self.use_episode_dones:
                    batch["dones"] = batch["episode_dones"]
                new_state, vec = self._packed_update(carry, batch)
                return new_state, vec

            state, vecs = jax.lax.scan(body, state, None, length=n)
            rng, k_s, k_aug = jax.random.split(state.rng, 3)
            o = self._device_obs(obs)
            if inference_aug is not None and isinstance(o, dict):
                o = inference_aug(k_aug, o)
            out, _ = self.model.actor_apply(state.params, o, mode="explore", rng=k_s)
            return state.replace(rng=rng), vecs.sum(axis=0), out

        return step_n_act

    def set_fused_updates(self, memory, chunk: int, budget: int) -> bool:
        """Arm act-fused updates for the next collection cycle: every
        explore-mode ``forward_async`` dispatches ``chunk`` gradient steps
        inside the act program until ``budget`` updates have shipped.
        Returns False (not armed) when the configuration can't fuse
        (host replay, recurrent model, obs RMS)."""
        from ..env.device_replay import DeviceReplayMemory

        if not (
            isinstance(memory, DeviceReplayMemory)
            and not self.model.is_recurrent
            and self.obs_rms is None
            and len(memory) > 0
            and chunk >= 1
        ):
            return False
        self._fused_plan = {"mem": memory, "chunk": int(chunk), "budget": int(budget), "done": 0}
        self._fused_vec_sum = None
        return True

    def finish_fused_updates(self):
        """Disarm the fused plan; returns (device metric-vec sum | None,
        number of gradient steps dispatched)."""
        plan = getattr(self, "_fused_plan", None)
        self._fused_plan = None
        vec, self._fused_vec_sum = getattr(self, "_fused_vec_sum", None), None
        return vec, (plan["done"] if plan else 0)

    def _fused_act_dispatch(self, obs):
        """One fused act+update dispatch under the armed plan; returns the
        actions device array, or None when the update budget is exhausted
        (caller falls back to the plain act program)."""
        plan = self._fused_plan
        chunk = plan["chunk"]
        if plan["budget"] < chunk:
            return None
        mem = plan["mem"]
        if getattr(self, "_fused_act_jit", None) is None:
            self._fused_act_jit = self._build_act_update_scan()
        self.train_state, vec, actions = self._fused_act_jit(
            self.train_state, mem.storage, mem.device_size, obs, chunk
        )
        plan["budget"] -= chunk
        plan["done"] += chunk
        self._fused_vec_sum = vec if self._fused_vec_sum is None else self._fused_vec_sum + vec
        self._inflight = getattr(self, "_inflight", 0) + 1
        if self._inflight >= 16:
            jax.block_until_ready(vec)
            self._inflight = 0
        return actions

    def update_parameters_lazy(self, memory, updates: int):
        """One gradient step; returns the packed metric vector WITHOUT any
        host sync, so callers can pipeline updates with host work (env
        stepping) and fetch metrics only at log time."""
        from ..env.device_replay import DeviceReplayMemory

        if isinstance(memory, DeviceReplayMemory) and not self.model.is_recurrent and self.obs_rms is None:
            if self._storage_update_jit is None:
                self._storage_update_jit = self._build_storage_update()
            self.train_state, metric_vec = self._storage_update_jit(
                self.train_state, memory.storage, memory.device_size
            )
            self._inflight = getattr(self, "_inflight", 0) + 1
            if self._inflight >= 16:
                jax.block_until_ready(metric_vec)
                self._inflight = 0
            return metric_vec

        if self.model.is_recurrent:
            assert hasattr(memory, "sample_windows"), (
                "Recurrent agents need T-step window sampling: use the host "
                "ReplayMemory with sampling_cfg type TStepTransition"
            )
            horizon = getattr(memory.sampling, "horizon", 8)
            sampled = memory.sample_windows(self.batch_size, horizon)
        else:
            sampled = memory.sample(self.batch_size)
        batch = self._prepare_batch(sampled)
        self.train_state, metric_vec = self._update_jit(self.train_state, batch)
        # Cap the async dispatch depth: on remote/tunneled devices an
        # unbounded chain of donated-buffer updates degrades the runtime's
        # flow control (~1000x slowdown observed); draining every K steps
        # costs one round trip per K.
        self._inflight = getattr(self, "_inflight", 0) + 1
        if self._inflight >= 16:
            jax.block_until_ready(metric_vec)
            self._inflight = 0
        return metric_vec

    @property
    def metric_keys(self):
        return self._metric_keys

    def reduce_metric_vecs(self, vec_sum, count: int) -> Dict[str, float]:
        """Average accumulated metric vectors; actor-gated metrics average
        over the updates where the actor actually stepped."""
        sums = dict(zip(self._metric_keys, np.asarray(vec_sum, np.float64)))
        p = self.metric_prefix
        n_actor = max(sums.pop(f"{p}/actor_updated", count), 1.0)
        actor_keys = {f"{p}/actor_loss", f"{p}/alpha_loss", f"{p}/entropy", f"{p}/actor_grad", f"{p}/q_match_rate"}
        metrics = {k: v / (n_actor if k in actor_keys else max(count, 1)) for k, v in sums.items()}
        if not self.is_discrete:
            metrics.pop(f"{p}/q_match_rate", None)
        metrics[f"{p}/target_entropy"] = self.target_entropy
        metrics[f"{p}/grad_steps"] = count
        return metrics

    def update_parameters(self, memory, updates: int) -> Dict[str, float]:
        metric_vec = self.update_parameters_lazy(memory, updates)
        metrics = dict(zip(self._metric_keys, np.asarray(metric_vec, np.float64)))
        p = self.metric_prefix
        if metrics.pop(f"{p}/actor_updated", 1.0) < 0.5:
            for k in (f"{p}/actor_loss", f"{p}/alpha_loss", f"{p}/entropy", f"{p}/actor_grad", f"{p}/q_match_rate"):
                metrics.pop(k, None)
        if not self.is_discrete:
            metrics.pop(f"{p}/q_match_rate", None)
        metrics[f"{p}/target_entropy"] = self.target_entropy
        metrics[f"{p}/grad_steps"] = 1
        return metrics

    # -------------------------------------------------- the jitted core
    def _compute_q_target(self, params, target_params, log_alpha, batch, rng,
                          reward_scale: Optional[float] = None):
        """Entropy-regularized min-over-heads bootstrap target (sac.py:110-134).

        ``reward_scale`` overrides the agent default (DrQ's target omits it,
        reference drq.py:79-81) — an explicit argument, not trace-time
        attribute mutation, so re-tracing can never capture the wrong value."""
        model = self.model
        alpha = jnp.exp(log_alpha)
        # With a shared-target backbone the target critic reads the LIVE
        # visual params, so the actor's next-obs features are exactly what
        # it would recompute — pass them explicitly.  (XLA's CSE already
        # merges the two identical encodes, so this is structural clarity
        # plus robustness if the traces ever diverge, not a measured win.)
        # RNN policies keep separate paths (features are state-dependent).
        share_next = (
            self.shared_backbone and model.shared_target_backbone
            and model.visual is not None and model.rnn is None
        )
        if self.is_discrete:
            (probs, ent), feat_next = model.actor_apply(params, batch["next_obs"], mode="max-entropy", rng=rng)
            q_next = model.target_critic_apply(params, target_params, batch["next_obs"], actions_prob=probs,
                                               visual_feature=feat_next if share_next else None)
            neg_logp = ent
        else:
            (next_actions, neg_logp), feat_next = model.actor_apply(params, batch["next_obs"], mode="max-entropy", rng=rng)
            q_next = model.target_critic_apply(params, target_params, batch["next_obs"], actions=next_actions,
                                               visual_feature=feat_next if share_next else None)
        min_q_next = q_next.min(axis=-1, keepdims=True) + alpha * neg_logp
        rewards = batch["rewards"] * (self.reward_scale if reward_scale is None else reward_scale)
        if self.ignore_dones:
            q_target = rewards + self.gamma * min_q_next
        else:
            q_target = rewards + (1.0 - batch["dones"].astype(jnp.float32)) * self.gamma * min_q_next
        return jax.lax.stop_gradient(q_target)  # [B, 1]

    def _critic_step(self, params, critic_opt, batch, q_target, critic_obs=None, critic_actions=None):
        model = self.model
        obs = batch["obs"] if critic_obs is None else critic_obs
        actions = batch["actions"] if critic_actions is None else critic_actions

        def loss_fn(p):
            # return_feature: the critic forward's visual feature is reused
            # by the actor step (reference saved_visual_feature,
            # sac.py:166-176) — the actor never re-encodes the clouds.
            q, feat = model.critic_apply(p, obs, actions=actions, return_feature=True)  # [B, num_q]
            loss = jnp.mean((q - q_target) ** 2) * model.num_q
            return loss, (q, feat)

        (loss, (q, feat)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        upd, critic_opt = self.critic_tx.update(grads, critic_opt, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, upd)
        gnorm = global_grad_norm(grads, mask_keys={"critic", "visual", "critic_visual"} if self.shared_backbone else {"critic", "critic_visual"})
        err = jnp.abs(q - q_target).max()
        saved_feat = jax.lax.stop_gradient(feat) if feat is not None else None
        return params, critic_opt, loss, q, gnorm, err, saved_feat

    def _actor_alpha_step(self, params, actor_opt, log_alpha, alpha_opt, batch, rng, actor_obs=None,
                          saved_feat=None):
        model = self.model
        obs = batch["obs"] if actor_obs is None else actor_obs
        alpha = jax.lax.stop_gradient(jnp.exp(log_alpha))
        # Reuse the critic forward's (pre-critic-step) visual features when
        # the actor would detach them anyway — one full visual encode saved
        # per actor update (see stale_actor_feature in __init__).
        reuse = saved_feat if (
            self.shared_backbone and self.detach_actor_feature and self.stale_actor_feature
        ) else None

        def loss_fn(p):
            (pi, neg_logp), feat = model.actor_apply(
                p, obs, mode="max-entropy", rng=rng, detach_visual=self.detach_actor_feature,
                visual_feature=reuse,
            )
            entropy_term = neg_logp.mean()
            q_match = jnp.zeros(())
            if self.is_discrete:
                q_table = model.critic_apply(p, obs, detach_value=True)  # [B, num_q, A]
                q_min = q_table.min(axis=-2)
                q_pi = (q_min * pi).sum(-1).mean()
                q_match = (jnp.argmax(pi, -1) == jnp.argmax(q_min, -1)).astype(jnp.float32).mean()
            else:
                vf = jax.lax.stop_gradient(feat) if (self.shared_backbone and feat is not None) else None
                q_pi_all = model.critic_apply(p, obs, actions=pi, visual_feature=vf)
                q_pi = q_pi_all.min(axis=-1).mean()
            loss = -(q_pi + alpha * entropy_term)
            return loss, (entropy_term, q_match)

        (actor_loss, (entropy_term, q_match)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        upd, actor_opt = self.actor_tx.update(grads, actor_opt, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, upd)
        actor_gnorm = global_grad_norm(grads, mask_keys={"actor"} | (set() if self.shared_backbone else {"visual"}))

        if self.automatic_alpha_tuning:
            ent_sg = jax.lax.stop_gradient(entropy_term)

            def alpha_loss_fn(la):
                return jnp.exp(la["log_alpha"]) * (ent_sg - self.target_entropy)

            alpha_loss, a_grads = jax.value_and_grad(alpha_loss_fn)({"log_alpha": log_alpha})
            a_upd, alpha_opt = self.alpha_tx.update(a_grads, alpha_opt, {"log_alpha": log_alpha})
            log_alpha = log_alpha + a_upd["log_alpha"]
        else:
            alpha_loss = jnp.zeros(())
        return params, actor_opt, log_alpha, alpha_opt, actor_loss, alpha_loss, entropy_term, actor_gnorm, q_match

    def _update_step_recurrent(self, state: SACState, batch):
        """Sequence SAC update over [B, H] windows (reference sac.py:110-128):
        the target path runs the actor/target-critic over the sequence
        [first obs frame, next_obs...] of length H+1 so the rnn state at each
        next_obs is conditioned on the window history; losses are masked by
        the window validity."""
        p = self.metric_prefix
        model = self.model
        rng, k_next, k_pi = jax.random.split(state.rng, 3)
        alpha = jnp.exp(state.log_alpha)
        is_valid = batch["is_valid"][..., None].astype(jnp.float32)  # [B, H, 1]
        rewards = batch["rewards"] * self.reward_scale  # [B, H, 1]
        dones = batch["dones"].astype(jnp.float32)

        first = jax.tree_util.tree_map(lambda x: x[:, :1], batch["obs"])
        next_seq = jax.tree_util.tree_map(
            lambda f, n: jnp.concatenate([f, n], axis=1), first, batch["next_obs"]
        )  # [B, H+1, ...]

        (next_actions, neg_logp), _ = model.actor_apply(
            state.params, next_seq, mode="max-entropy", rng=k_next, seq=True
        )
        q_next = model.target_critic_apply(state.params, state.target_params, next_seq,
                                           actions=next_actions, seq=True)
        min_q_next = q_next.min(axis=-1, keepdims=True) + alpha * neg_logp  # [B, H+1, 1]
        min_q_next = min_q_next[:, 1:]
        if self.ignore_dones:
            q_target = rewards + self.gamma * min_q_next
        else:
            q_target = rewards + (1.0 - dones) * self.gamma * min_q_next
        q_target = jax.lax.stop_gradient(q_target)

        def critic_loss_fn(params):
            q = model.critic_apply(params, batch["obs"], actions=batch["actions"], seq=True)  # [B, H, num_q]
            err = (q - q_target) ** 2 * is_valid
            # masked mean over valid frames, x num_q (reference critic loss scale)
            loss = err.sum() / jnp.maximum(is_valid.sum() * model.num_q, 1.0) * model.num_q
            return loss, q

        (critic_loss, q), grads = jax.value_and_grad(critic_loss_fn, has_aux=True)(state.params)
        upd, critic_opt = self.critic_tx.update(grads, state.critic_opt, state.params)
        params = jax.tree_util.tree_map(lambda a, b: a + b, state.params, upd)
        critic_gnorm = global_grad_norm(grads, mask_keys={"critic", "visual", "rnn", "critic_visual"})
        abs_err = (jnp.abs(q - q_target) * is_valid).max()

        def do_actor(operand):
            params, aopt, la, laopt = operand
            alpha_c = jax.lax.stop_gradient(jnp.exp(la))

            def loss_fn(prm):
                (pi, nlp), feat = model.actor_apply(
                    prm, batch["obs"], mode="max-entropy", rng=k_pi, seq=True,
                    detach_visual=self.detach_actor_feature,
                )
                ent = (nlp * is_valid).sum() / jnp.maximum(is_valid.sum(), 1.0)
                vf = jax.lax.stop_gradient(feat) if (self.shared_backbone and feat is not None) else None
                q_pi = model.critic_apply(prm, batch["obs"], actions=pi, visual_feature=vf, seq=True)
                q_pi = q_pi.min(axis=-1, keepdims=True)
                q_term = (q_pi * is_valid).sum() / jnp.maximum(is_valid.sum(), 1.0)
                return -(q_term + alpha_c * ent), ent

            (a_loss, ent), agrads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            aupd, aopt = self.actor_tx.update(agrads, aopt, params)
            prm = jax.tree_util.tree_map(lambda a, b: a + b, params, aupd)
            a_g = global_grad_norm(agrads, mask_keys={"actor"})
            if self.automatic_alpha_tuning:
                ent_sg = jax.lax.stop_gradient(ent)
                al_loss, la_grads = jax.value_and_grad(
                    lambda d: jnp.exp(d["log_alpha"]) * (ent_sg - self.target_entropy)
                )({"log_alpha": la})
                la_upd, laopt = self.alpha_tx.update(la_grads, laopt, {"log_alpha": la})
                la = la + la_upd["log_alpha"]
            else:
                al_loss = jnp.zeros(())
            return prm, aopt, la, laopt, (a_loss, al_loss, ent, a_g, jnp.zeros(()), jnp.ones(()))

        def skip_actor(operand):
            params, aopt, la, laopt = operand
            z = jnp.zeros(())
            return params, aopt, la, laopt, (z, z, z, z, z, z)

        params, actor_opt, log_alpha, alpha_opt, actor_metrics = jax.lax.cond(
            state.updates % self.actor_update_interval == 0,
            do_actor, skip_actor, (params, state.actor_opt, state.log_alpha, state.alpha_opt),
        )
        a_loss, al_loss, ent, a_gnorm, q_match, actor_updated = actor_metrics
        target_params = jax.lax.cond(
            state.updates % self.target_update_interval == 0,
            lambda t: soft_update(t, params, self.tau_tree), lambda t: t, state.target_params,
        )
        new_state = state.replace(
            params=params, target_params=target_params, log_alpha=log_alpha,
            actor_opt=actor_opt, critic_opt=critic_opt, alpha_opt=alpha_opt,
            rng=rng, updates=state.updates + 1,
        )
        metrics = {
            f"{p}/critic_loss": critic_loss,
            f"{p}/max_critic_abs_err": abs_err,
            f"{p}/alpha": jnp.exp(log_alpha),
            f"{p}/q": q.min(axis=-1).mean(),
            f"{p}/q_target": q_target.mean(),
            f"{p}/critic_grad": critic_gnorm,
            f"{p}/actor_loss": a_loss,
            f"{p}/alpha_loss": al_loss,
            f"{p}/entropy": ent,
            f"{p}/actor_grad": a_gnorm,
            f"{p}/q_match_rate": q_match,
            f"{p}/actor_updated": actor_updated,
        }
        return new_state, metrics

    def _update_step(self, state: SACState, batch):
        if self.model.is_recurrent:
            return self._update_step_recurrent(state, batch)
        p = self.metric_prefix
        rng, k_next, k_pi, k_pre = jax.random.split(state.rng, 4)
        if self.obs_processor is not None:
            # pre_process augmentations run inside the jitted step
            # (reference BaseAgent.process_obs, module_utils.py:138).
            batch = dict(batch)
            batch["obs"] = self.obs_processor(k_pre, batch["obs"])
            batch["next_obs"] = self.obs_processor(jax.random.fold_in(k_pre, 1), batch["next_obs"])
        q_target = self._compute_q_target(state.params, state.target_params, state.log_alpha, batch, k_next)
        params, critic_opt, critic_loss, q, critic_gnorm, abs_err, saved_feat = self._critic_step(
            state.params, state.critic_opt, batch, q_target
        )

        def do_actor(operand):
            params, aopt, la, laopt = operand
            out = self._actor_alpha_step(params, aopt, la, laopt, batch, k_pi, saved_feat=saved_feat)
            (params, aopt, la, laopt, a_loss, al_loss, ent, a_g, qm) = out
            return params, aopt, la, laopt, (a_loss, al_loss, ent, a_g, qm, jnp.ones(()))

        def skip_actor(operand):
            params, aopt, la, laopt = operand
            z = jnp.zeros(())
            return params, aopt, la, laopt, (z, z, z, z, z, z)

        params, actor_opt, log_alpha, alpha_opt, actor_metrics = jax.lax.cond(
            state.updates % self.actor_update_interval == 0,
            do_actor,
            skip_actor,
            (params, state.actor_opt, state.log_alpha, state.alpha_opt),
        )
        a_loss, al_loss, ent, a_gnorm, q_match, actor_updated = actor_metrics

        target_params = jax.lax.cond(
            state.updates % self.target_update_interval == 0,
            lambda t: soft_update(t, params, self.tau_tree),
            lambda t: t,
            state.target_params,
        )

        new_state = state.replace(
            params=params,
            target_params=target_params,
            log_alpha=log_alpha,
            actor_opt=actor_opt,
            critic_opt=critic_opt,
            alpha_opt=alpha_opt,
            rng=rng,
            updates=state.updates + 1,
        )
        metrics = {
            f"{p}/critic_loss": critic_loss,
            f"{p}/max_critic_abs_err": abs_err,
            f"{p}/alpha": jnp.exp(log_alpha),
            f"{p}/q": q.min(axis=-1).mean(),
            f"{p}/q_target": q_target.mean(),
            f"{p}/critic_grad": critic_gnorm,
            f"{p}/actor_loss": a_loss,
            f"{p}/alpha_loss": al_loss,
            f"{p}/entropy": ent,
            f"{p}/actor_grad": a_gnorm,
            f"{p}/q_match_rate": q_match,
            f"{p}/actor_updated": actor_updated,
        }
        return new_state, metrics
