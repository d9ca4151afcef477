"""DrQ / SVEA: SAC regularized with K-fold data augmentation.

Parity target: reference ``pyrl/methods/mfrl/drq.py`` — obs & next_obs are
repeat-interleaved num_aug times and augmented; the bootstrap target is
averaged over augmentations; SVEA stacks (augmented, original) observations
and computes the target from the ORIGINAL next_obs; the actor updates on the
first augmented copy (SVEA: the original); inference can optionally augment.
Like the reference, DrQ does NOT apply reward_scale in the target.

TPU design: the augmentations are pure jittable kernels (ops/augment.py), so
the whole repeat->augment->update pipeline is one fused jitted step — the
reference's torchvision/kornia host-side augs become on-device VPU code.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from ..ops.augment import apply_augs_to_packed, augs_are_xyz_only, build_data_augmentations
from . import MFRL
from .optim import global_grad_norm, soft_update
from .sac import SAC


def _repeat_interleave(tree, k: int):
    return jax.tree_util.tree_map(lambda x: jnp.repeat(x, k, axis=0), tree)


def _interleave_pairs(tree_a, tree_b):
    """[B] x [B] -> [2B] as [a0, b0, a1, b1, ...] (GDict.stack(axis=1).merge)."""

    def _one(a, b):
        stacked = jnp.stack([a, b], axis=1)
        return stacked.reshape((-1,) + a.shape[1:])

    return jax.tree_util.tree_map(_one, tree_a, tree_b)


@MFRL.register_module()
class DrQ(SAC):
    def __init__(self, num_aug=2, obs_aug=None, svea=False, inference_aug=None, *args, **kwargs):
        if svea:
            assert num_aug == 1, "SVEA only needs num_aug=1"
        self.num_aug = int(num_aug)
        self.svea = bool(svea)
        self.obs_aug = build_data_augmentations(obs_aug)
        self.inference_aug = self.obs_aug if inference_aug == "same" else build_data_augmentations(inference_aug)
        kwargs.setdefault("metric_prefix", "drq")
        super().__init__(*args, **kwargs)

    def _apply_obs_aug(self, rng, obs):
        """Dispatch the aug stack by storage layout: raw obs dicts take the
        reference path; packed replay storage ({"pcd": [..., N, C]}) keeps
        the pack_features fast path by augmenting the xyz channel block in
        place (ops/augment.py:apply_augs_to_packed)."""
        if self.obs_aug is None:
            return obs
        if isinstance(obs, dict) and "pcd" in obs:
            assert augs_are_xyz_only(self.obs_aug), (
                "pack_features replay storage supports xyz-only augmentation "
                "stacks (GlobalRotScaleTrans/RandomJitterPoints on xyz); use "
                "raw-dict storage for rgb/seg/point-count augmentations"
            )
            return apply_augs_to_packed(self.obs_aug, rng, obs)
        return self.obs_aug(rng, obs)

    def _update_step(self, state, batch):
        p = self.metric_prefix
        K = self.num_aug
        rng, k_next, k_pi, k_aug_obs, k_aug_next = jax.random.split(state.rng, 5)

        obs_rep = _repeat_interleave(batch["obs"], K)
        aug_obs = self._apply_obs_aug(k_aug_obs, obs_rep)
        B = jax.tree_util.tree_leaves(batch["rewards"])[0].shape[0]

        if not self.svea:
            next_rep = _repeat_interleave(batch["next_obs"], K)
            aug_next = self._apply_obs_aug(k_aug_next, next_rep)
            target_batch = {
                "next_obs": aug_next,
                "rewards": jnp.repeat(batch["rewards"], K, axis=0),
                "dones": jnp.repeat(batch["dones"], K, axis=0),
            }
            # NOTE: reference DrQ omits reward_scale in the target (drq.py:79-81).
            q_target = self._compute_q_target(state.params, state.target_params, state.log_alpha,
                                              target_batch, k_next, reward_scale=1.0)
            q_target = q_target.reshape(B, K).mean(axis=1, keepdims=True)  # avg over augs (drq.py:84)
            q_target = jnp.repeat(q_target, K, axis=0)  # back to [B*K, 1]
            critic_obs = aug_obs
            critic_actions = jnp.repeat(batch["actions"], K, axis=0)
        else:
            target_batch = {"next_obs": batch["next_obs"], "rewards": batch["rewards"], "dones": batch["dones"]}
            q_target = self._compute_q_target(state.params, state.target_params, state.log_alpha,
                                              target_batch, k_next, reward_scale=1.0)
            q_target = jnp.repeat(q_target, K + 1, axis=0)  # [B*(K+1), 1]
            critic_obs = _interleave_pairs(aug_obs, batch["obs"])
            critic_actions = jnp.repeat(batch["actions"], K + 1, axis=0)

        params, critic_opt, critic_loss, q, critic_gnorm, abs_err, saved_feat = self._critic_step(
            state.params, state.critic_opt, batch, q_target, critic_obs=critic_obs, critic_actions=critic_actions
        )

        # Actor obs: first augmented copy (drq.py:115), SVEA: original obs.
        # The matching rows of the critic forward's saved visual features are
        # sliced out so the actor can reuse them (reference
        # saved_visual_feature): non-SVEA critic rows are [b0k0, b0k1, ...]
        # so copy 0 is ::K; SVEA interleaves (aug, orig) so orig is 1::2.
        if self.svea:
            actor_obs = batch["obs"]
            actor_feat = saved_feat[1::2] if saved_feat is not None else None
        else:
            actor_obs = jax.tree_util.tree_map(lambda x: x.reshape((B, K) + x.shape[1:])[:, 0], aug_obs)
            actor_feat = saved_feat[::K] if saved_feat is not None else None

        def do_actor(operand):
            params, aopt, la, laopt = operand
            out = self._actor_alpha_step(params, aopt, la, laopt, batch, k_pi, actor_obs=actor_obs,
                                         saved_feat=actor_feat)
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
