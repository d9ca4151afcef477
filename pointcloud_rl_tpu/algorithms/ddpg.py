"""DDPG / TD3 as a jitted update step.

Named in BASELINE.json's target scope ("the SAC/DrQ/DDPG update loops ...
run as jitted XLA steps").  Deterministic tanh actor with exploration noise,
twin-Q critics (num_heads=1 recovers classic DDPG), optional TD3-style
target policy smoothing and delayed actor updates — reusing the SAC
infrastructure: the same ActorCriticModel, optimizer masks, EMA tau trees,
and the packed-metrics/async-dispatch machinery.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import MFRL
from .optim import global_grad_norm, soft_update
from .sac import SAC, SACState


@MFRL.register_module()
class DDPG(SAC):
    def __init__(
        self,
        *args,
        exploration_noise: float = 0.1,
        target_noise: float = 0.2,
        target_noise_clip: float = 0.5,
        use_target_smoothing: bool = True,  # TD3; False = classic DDPG
        **kwargs,
    ):
        kwargs.setdefault("metric_prefix", "ddpg")
        kwargs.setdefault("automatic_alpha_tuning", False)
        kwargs.setdefault("alpha", 1e-8)  # entropy term unused
        self.exploration_noise = float(exploration_noise)
        self.target_noise = float(target_noise)
        self.target_noise_clip = float(target_noise_clip)
        self.use_target_smoothing = bool(use_target_smoothing)
        super().__init__(*args, **kwargs)
        assert not self.is_discrete, "DDPG needs continuous actions"
        # Canonical DDPG/TD3 uses a TARGET policy network for a' = pi_t(s'):
        # add the actor subtree to the target params (SAC's init_target_params
        # copies only critic/visual) and extend the EMA tau tree to match.
        from .optim import build_tau_tree

        tp = dict(self.train_state.target_params)
        tp["actor"] = jax.tree_util.tree_map(jnp.array, self.train_state.params["actor"])
        self.train_state = self.train_state.replace(target_params=tp)
        self.tau_tree = build_tau_tree(kwargs.get("update_coeff", 0.005), tp)

    # exploration: deterministic action + Gaussian noise, clipped to bounds
    def _build_act(self, mode: str):
        if mode not in ("explore", "sample"):
            return super()._build_act(mode)
        bounds = self.model.actor.head._bounds()[0] if hasattr(self.model.actor.head, "_bounds") else None

        @jax.jit
        def act(state: SACState, obs):
            rng, k_n = jax.random.split(state.rng)
            obs = self._device_obs(obs)
            out, _ = self.model.actor_apply(state.params, obs, mode="eval")
            noise = self.exploration_noise * jax.random.normal(k_n, out.shape)
            a = out + noise
            if bounds is not None:
                a = jnp.clip(a, bounds[0], bounds[1])
            return a, state.replace(rng=rng)

        return act

    def _compute_q_target(self, params, target_params, log_alpha, batch, rng):
        model = self.model
        next_a, _ = model.target_actor_apply(params, target_params, batch["next_obs"], mode="eval")
        if self.use_target_smoothing:
            noise = jnp.clip(
                self.target_noise * jax.random.normal(rng, next_a.shape),
                -self.target_noise_clip,
                self.target_noise_clip,
            )
            bounds = self.model.actor.head._bounds()[0] if hasattr(self.model.actor.head, "_bounds") else None
            lo, hi = (bounds[0], bounds[1]) if bounds is not None else (-1.0, 1.0)
            next_a = jnp.clip(next_a + noise, lo, hi)
        q_next = model.target_critic_apply(params, target_params, batch["next_obs"], actions=next_a)
        min_q_next = q_next.min(axis=-1, keepdims=True)
        rewards = batch["rewards"] * self.reward_scale
        if self.ignore_dones:
            q_target = rewards + self.gamma * min_q_next
        else:
            q_target = rewards + (1.0 - batch["dones"].astype(jnp.float32)) * self.gamma * min_q_next
        return jax.lax.stop_gradient(q_target)

    def _actor_alpha_step(self, params, actor_opt, log_alpha, alpha_opt, batch, rng, actor_obs=None,
                          saved_feat=None):
        model = self.model
        obs = batch["obs"] if actor_obs is None else actor_obs
        reuse = saved_feat if (
            self.shared_backbone and self.detach_actor_feature
            and getattr(self, "stale_actor_feature", True)
        ) else None

        def loss_fn(p):
            pi, feat = model.actor_apply(p, obs, mode="eval", detach_visual=self.detach_actor_feature,
                                         visual_feature=reuse)
            vf = jax.lax.stop_gradient(feat) if (self.shared_backbone and feat is not None) else None
            q_pi = model.critic_apply(p, obs, actions=pi, visual_feature=vf)
            # deterministic policy gradient on the FIRST head (TD3 convention)
            return -q_pi[..., 0].mean(), jnp.zeros(())

        (actor_loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        upd, actor_opt = self.actor_tx.update(grads, actor_opt, params)
        params = jax.tree_util.tree_map(lambda a, b: a + b, params, upd)
        gnorm = global_grad_norm(grads, mask_keys={"actor"})
        z = jnp.zeros(())
        return params, actor_opt, log_alpha, alpha_opt, actor_loss, z, z, gnorm, z
