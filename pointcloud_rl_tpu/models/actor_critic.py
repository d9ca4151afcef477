"""Actor / critic applications and their functional composition.

Parity targets: reference ``pyrl/networks/applications/actor_critic.py``
(ContinuousActor/Critic, DiscreteActor/Critic), ``backbones/visuomotor.py``
(obs-dict handling, robot-state concat, saved visual feature reuse), and
``networks/builder.py`` (shared visual backbone between actor, critic, and
target critic).

Design: in functional JAX, "sharing a module object" becomes "sharing a
params subtree".  :class:`ActorCriticModel` holds the module definitions and
static flags; parameters live in ONE dict::

    params = {
        "visual":        actor's visual encoder params (shared when
                         shared_backbone; absent for state-only obs),
        "critic_visual": critic's own visual params (only when NOT shared),
        "actor":         actor final-MLP + head params,
        "critic":        critic ensemble params,
    }

    target_params = subset mirror: always "critic"; plus the visual subtrees
    when the target does NOT share the live backbone
    (reference build_target_network, networks/builder.py:28-45).

All applies are pure; sampling modes thread a 'sample' rng.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from . import APPLICATION
from .blocks import MLP, scale_gradient

VISUAL_STRIP_SUBSTRINGS = ("_box", "_seg", "_sem_label")


def split_obs(obs) -> Tuple[Any, Optional[jnp.ndarray]]:
    """Split an observation into (visual_obs, robot_state).

    Mirrors Visuomotor.forward's obs-dict handling (visuomotor.py:81-91):
    pops "state"/"agent" as the robot state vector, strips auxiliary
    ``*_box``/``*_seg``/``visual_state`` keys, and unwraps single-key dicts
    that aren't raw pointcloud/image dicts.
    """
    if not isinstance(obs, dict):
        return obs, None
    obs = dict(obs)
    robot_state = None
    for key in list(obs.keys()):
        if key == "visual_state" or any(s in key for s in VISUAL_STRIP_SUBSTRINGS):
            if key != "seg":  # "seg" itself is a real pointcloud channel
                obs.pop(key)
    for key in ("state", "agent"):
        if key in obs:
            assert robot_state is None, "Only one robot state key allowed"
            robot_state = obs.pop(key)
    if not ("xyz" in obs or "rgb" in obs or "rgbd" in obs or "pcd" in obs) and len(obs) == 1:
        obs = next(iter(obs.values()))
    return obs, robot_state


class ActorHead(nn.Module):
    """final_mlp -> head (ActorCriticBase semantics, actor_critic.py:9-60)."""

    final_mlp: Optional[nn.Module]
    head: Optional[nn.Module]

    @nn.compact
    def __call__(self, feat, mode: str = "explore"):
        if self.final_mlp is not None:
            feat = self.final_mlp(feat)
        if self.head is not None:
            return self.head(feat, mode=mode)
        return feat


class CriticEnsemble(nn.Module):
    """num_heads independent Q-MLPs over concat(feature, action).

    Equivalent to the reference's list of per-head Visuomotor final-MLPs with
    a shared visual backbone (ContinuousCritic with num_heads>1): parameters
    are stacked on a leading axis and evaluated with one vmapped matmul chain
    — the TPU-friendly ensemble layout.  Output: [B, num_heads, out_dim].
    """

    mlp_kwargs: Dict[str, Any]
    num_heads: int = 1

    @nn.compact
    def __call__(self, feat):
        Vmapped = nn.vmap(
            MLP,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            in_axes=None,
            out_axes=0,
            axis_size=self.num_heads,
        )
        q = Vmapped(**self.mlp_kwargs)(feat)  # [num_heads, B, out_dim]
        return jnp.moveaxis(q, 0, -2)  # [B, num_heads, out_dim]


# Registered for config parity: configs name these types; construction is
# performed by models.builder.build_actor_critic, not build_from_cfg.
@APPLICATION.register_module(name="ContinuousPolicy")
@APPLICATION.register_module(name="ContinuousActor")
class ContinuousActorDef:
    def __init__(self, **cfg):
        self.cfg = cfg


@APPLICATION.register_module(name="ContinuousValue")
@APPLICATION.register_module(name="ContinuousCritic")
class ContinuousCriticDef:
    def __init__(self, **cfg):
        self.cfg = cfg


@APPLICATION.register_module(name="DiscreteActor")
class DiscreteActorDef:
    def __init__(self, **cfg):
        self.cfg = cfg


@APPLICATION.register_module(name="DiscreteCritic")
class DiscreteCriticDef:
    def __init__(self, **cfg):
        self.cfg = cfg


@dataclasses.dataclass(frozen=True)
class ActorCriticModel:
    """Module definitions + static wiring flags; applies are pure functions."""

    visual: Optional[nn.Module]
    critic_visual: Optional[nn.Module]  # None => critic reuses actor visual (or no visual)
    actor: ActorHead
    critic: CriticEnsemble
    shared_backbone: bool = True
    shared_target_backbone: bool = True
    is_discrete: bool = False
    num_q: int = 2
    share_feature: bool = False
    average_grad: bool = True
    rnn: Optional[nn.Module] = None  # shared recurrent core (SHARED_KEYS includes "rnn")

    @property
    def is_recurrent(self) -> bool:
        return self.rnn is not None

    # ------------------------------------------------------------- params
    def init_params(self, rng, example_obs, example_action) -> Dict[str, Any]:
        kv, kcv, ka, kc, ks, kr = jax.random.split(rng, 6)
        params: Dict[str, Any] = {}
        feat = None
        vis_obs, robot_state = split_obs(example_obs)
        if self.visual is not None:
            pv = self.visual.init({"params": kv}, vis_obs)
            params["visual"] = pv["params"]
            feat = self.visual.apply({"params": params["visual"]}, vis_obs)
        if self.critic_visual is not None:
            pcv = self.critic_visual.init({"params": kcv}, vis_obs)
            params["critic_visual"] = pcv["params"]
        if self.rnn is not None:
            # reference visuomotor.py:114-121: robot state feeds the rnn
            # input AND is re-appended after it (line 130).
            base = self._with_state(feat, robot_state, vis_obs)
            pr = self.rnn.init({"params": kr}, base)
            params["rnn"] = pr["params"]
            feat = self.rnn.apply({"params": params["rnn"]}, base)
        actor_feat = self._with_state(feat, robot_state, vis_obs)
        pa = self.actor.init({"params": ka, "sample": ks}, actor_feat, mode="mean")
        params["actor"] = pa["params"]
        critic_feat = actor_feat if self.is_discrete else jnp.concatenate([actor_feat, example_action], axis=-1)
        pc = self.critic.init({"params": kc}, critic_feat)
        params["critic"] = pc["params"]
        return params

    def init_target_params(self, params: Dict[str, Any]) -> Dict[str, Any]:
        """Hard-copy the subtrees the target owns (builder.py:28-45 semantics)."""
        target = {"critic": jax.tree_util.tree_map(jnp.array, params["critic"])}
        if not self.shared_target_backbone:
            for key in ("visual", "critic_visual", "rnn"):  # SHARED_KEYS subtrees
                if key in params:
                    target[key] = jax.tree_util.tree_map(jnp.array, params[key])
        return target

    # ------------------------------------------------------------- applies
    @staticmethod
    def _with_state(feat, robot_state, vis_obs):
        """Concat visual feature with robot state (visuomotor.py:130-132)."""
        if feat is None:
            if robot_state is not None:
                return jnp.asarray(robot_state, jnp.float32)
            return jnp.asarray(vis_obs, jnp.float32)
        if robot_state is not None:
            return jnp.concatenate([feat, jnp.asarray(robot_state, feat.dtype)], axis=-1)
        return feat

    @staticmethod
    def _flatten_time(tree):
        """[B, T, ...] -> [B*T, ...] for per-frame visual encoders."""
        leaf = tree if not isinstance(tree, dict) else next(iter(tree.values()))
        B, T = leaf.shape[:2]
        flat = jax.tree_util.tree_map(lambda x: x.reshape((B * T,) + x.shape[2:]), tree)
        return flat, B, T

    def encode(self, params, obs, which: str = "actor", seq: bool = False):
        """Visual feature only (pre-rnn); handles [B, T, ...] when seq."""
        vis_obs, robot_state = split_obs(obs)
        visual_params = None
        module = self.visual
        if which == "critic" and self.critic_visual is not None:
            module, visual_params = self.critic_visual, params.get("critic_visual")
        elif self.visual is not None:
            visual_params = params["visual"]
        if module is None:
            return None, robot_state, vis_obs
        if seq:
            flat, B, T = self._flatten_time(vis_obs)
            feat = module.apply({"params": visual_params}, flat).reshape(B, T, -1)
        else:
            feat = module.apply({"params": visual_params}, vis_obs)
        return feat, robot_state, vis_obs

    def _apply_rnn(self, params, feat, robot_state, vis_obs, rnn_states, episode_dones, rnn_mode):
        """visual feat -> rnn (state concat before AND after; visuomotor.py:114-130)."""
        base = self._with_state(feat, robot_state, vis_obs)
        out = self.rnn.apply(
            {"params": params["rnn"]}, base, rnn_states=rnn_states,
            episode_dones=episode_dones, rnn_mode=rnn_mode,
        )
        return out  # features, or (features, state) when rnn_mode != "base"

    def _features(self, params, obs, which: str, seq: bool, visual_feature,
                  rnn_states=None, episode_dones=None, rnn_mode: str = "base",
                  detach_visual: bool = False):
        """Shared feature pipeline: visual -> [rnn] -> concat robot state.

        Returns (final_features, post_rnn_feature aka saved_visual_feature,
        next_rnn_state or None)."""
        vis_obs, robot_state = split_obs(obs)
        if visual_feature is not None:
            feat = visual_feature
        else:
            feat, robot_state, vis_obs = self.encode(params, obs, which, seq)
            if detach_visual and feat is not None:
                feat = jax.lax.stop_gradient(feat)
        next_state = None
        if self.rnn is not None and visual_feature is None:
            out = self._apply_rnn(params, feat, robot_state, vis_obs, rnn_states, episode_dones, rnn_mode)
            if rnn_mode != "base":
                feat, next_state = out
            else:
                feat = out
        x = self._with_state(feat, robot_state, vis_obs)
        return x, feat, next_state

    def actor_apply(self, params, obs, mode: str = "explore", rng=None, detach_visual: bool = False,
                    visual_feature=None, seq: bool = False, rnn_states=None, episode_dones=None,
                    rnn_mode: str = "base"):
        """Actor forward; with mode="max-entropy" returns (action, neg_logp).

        Returns ((head output, saved_feature) or with rnn_mode!="base"
        additionally the next rnn state as a third element)."""
        x, feat, next_state = self._features(
            params, obs, "actor", seq, visual_feature, rnn_states, episode_dones, rnn_mode, detach_visual
        )
        rngs = {"sample": rng} if rng is not None else {}
        out = self.actor.apply({"params": params["actor"]}, x, mode=mode, rngs=rngs)
        if rnn_mode != "base":
            return out, feat, next_state
        return out, feat

    def _critic_heads(self, critic_params, visual_params_src, obs, actions, visual_feature,
                      seq: bool = False, episode_dones=None, return_feature: bool = False):
        x, feat, _ = self._features(visual_params_src, obs, "critic", seq, visual_feature,
                                    episode_dones=episode_dones)
        if self.share_feature and self.num_q > 1 and self.average_grad:
            x = scale_gradient(x, 1.0 / self.num_q)
        if actions is not None and not self.is_discrete:
            x = jnp.concatenate([x, actions], axis=-1)
        q = self.critic.apply({"params": critic_params}, x)  # [..., H, out]
        return (q, feat) if return_feature else q

    def critic_apply(self, params, obs, actions=None, actions_prob=None, visual_feature=None,
                     detach_value: bool = False, seq: bool = False, episode_dones=None,
                     return_feature: bool = False):
        """Q-values. Continuous: [B, num_q]. Discrete: gathers/avgs over actions
        (DiscreteCritic semantics, actor_critic.py:137-162).

        ``return_feature=True`` additionally returns the visual feature from
        the forward (the reference's ``saved_visual_feature``,
        visuomotor.py:127-135) so the actor step can reuse it instead of
        re-encoding."""
        q = self._critic_heads(params["critic"], params, obs, actions, visual_feature,
                               seq=seq, episode_dones=episode_dones, return_feature=return_feature)
        feat = None
        if return_feature:
            q, feat = q
        if detach_value:
            q = jax.lax.stop_gradient(q)
        if not self.is_discrete:
            q = q[..., 0]  # [B, num_q]
        elif actions_prob is not None:
            q = (q * actions_prob[..., None, :]).sum(-1)  # V = sum pi*Q -> [B, num_q]
        elif actions is not None:
            idx = jnp.broadcast_to(actions.astype(jnp.int32), q.shape[:-1])[..., None]
            q = jnp.take_along_axis(q, idx, axis=-1)[..., 0]  # [B, num_q]
        # else: raw Q-table [B, num_q, num_choices]
        return (q, feat) if return_feature else q

    def target_actor_apply(self, params, target_params, obs, mode: str = "eval", rng=None, seq: bool = False):
        """Actor forward through target-owned subtrees (target policy network,
        canonical DDPG/TD3 a' = pi_target(s')).  Subtrees absent from
        target_params (e.g. a shared-target visual backbone, or SAC which has
        no target actor) fall back to the live params."""
        src = dict(params)
        src.update(target_params)
        return self.actor_apply(src, obs, mode=mode, rng=rng, seq=seq)

    def target_critic_apply(self, params, target_params, obs, actions=None, actions_prob=None,
                            seq: bool = False, episode_dones=None, visual_feature=None):
        """Target critic; shared-target backbones read the LIVE visual params.

        ``visual_feature``: with a shared-target backbone the live actor's
        next-obs features are IDENTICAL to what this would compute — passing
        them skips a full visual encode (the update is bandwidth-bound on
        exactly those activations)."""
        assert visual_feature is None or self.shared_target_backbone, (
            "visual_feature reuse requires the shared-target backbone (the "
            "target otherwise owns its visual params)"
        )
        src = dict(params)
        src.update(target_params)  # target-owned subtrees override live ones
        q = self._critic_heads(target_params["critic"], src, obs, actions, visual_feature,
                               seq=seq, episode_dones=episode_dones)
        if not self.is_discrete:
            return q[..., 0]
        if actions_prob is not None:
            return (q * actions_prob[..., None, :]).sum(-1)
        if actions is not None:
            idx = jnp.broadcast_to(actions.astype(jnp.int32), q.shape[:-1])[..., None]
            return jnp.take_along_axis(q, idx, axis=-1)[..., 0]
        return q
