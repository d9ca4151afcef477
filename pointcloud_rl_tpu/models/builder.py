"""Construct an :class:`ActorCriticModel` from actor/critic configs.

Parity target: reference ``pyrl/networks/builder.py`` (build_actor_critic's
SHARED_KEYS visual sharing, build_target_network's shared-target handling)
expressed functionally: "sharing an nn.Module object" becomes "omitting the
critic's own visual params so both read ``params['visual']``".
"""

from __future__ import annotations

from copy import deepcopy
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import numpy as np

from . import build_all
from .actor_critic import ActorCriticModel, ActorHead, CriticEnsemble

_MLP_TYPES = ("MLP", "LinearMLP", "ConvMLP")
_MLP_FIELDS = ("mlp_spec", "norm_cfg", "act_cfg", "bias", "inactivated_output", "ignore_first_ln", "zero_out_indices", "dtype")
# Module types whose dataclass takes a mixed-precision compute dtype.
_DTYPE_TYPES = _MLP_TYPES + ("PointNet",)


def _inject_dtype(cfg: Optional[dict], dtype: str) -> Optional[dict]:
    """Opt a sub-network into the bf16 matmul path if its type supports it."""
    if cfg is not None and cfg.get("type") in _DTYPE_TYPES:
        cfg = dict(cfg)
        cfg.setdefault("dtype", dtype)
    return cfg


def _mlp_kwargs(cfg: Optional[dict]) -> Optional[dict]:
    if cfg is None:
        return None
    cfg = dict(cfg)
    assert cfg.pop("type") in _MLP_TYPES, f"Critic/actor final mlp must be an MLP type, got {cfg}"
    return {k: cfg[k] for k in _MLP_FIELDS if k in cfg}


def _split_nn_cfg(nn_cfg: Optional[dict]) -> Tuple[Optional[dict], Optional[dict]]:
    """Split an nn_cfg into (visual_nn_cfg, mlp_cfg).

    Visuomotor nests both (visuomotor.py:16-39); a bare MLP nn_cfg means a
    state-only network with no visual encoder.
    """
    if nn_cfg is None:
        return None, None
    nn_cfg = dict(nn_cfg)
    t = nn_cfg.get("type")
    if t is not None and "Visuomotor" in t:
        return nn_cfg.get("visual_nn_cfg"), nn_cfg.get("mlp_cfg")
    if t in _MLP_TYPES:
        return None, nn_cfg
    # A raw backbone (PointNet/CNN) without fusion mlp.
    return nn_cfg, None


def _head_cfg_with_bound(head_cfg: Optional[dict], action_space) -> Optional[dict]:
    if head_cfg is None:
        return None
    head_cfg = dict(head_cfg)
    if action_space is not None and getattr(action_space, "is_bounded", lambda: False)():
        head_cfg["bound"] = [np.asarray(action_space.low), np.asarray(action_space.high)]
    return head_cfg


def extract_freeze_param_cfg(nn_cfg: Optional[dict]) -> dict:
    """Visuomotor freeze flags -> optimizer exclusion regexes
    (reference visuomotor.py:42-51 freeze_params; functional freezing =
    excluding the subtree from every optimizer)."""
    out = {}
    if nn_cfg:
        if nn_cfg.get("freeze_visual_nn"):
            out["(.*?)visual_nn(.*?)"] = None
        if nn_cfg.get("freeze_mlp"):
            out["^actor(.*?)"] = None
    return out


def build_actor_critic(
    actor_cfg: dict,
    critic_cfg: dict,
    env_params: dict,
    shared_backbone: bool = False,
    shared_target_backbone: Optional[bool] = None,
    bf16: bool = False,
) -> ActorCriticModel:
    """Build module defs; parameters are created later by ``init_params``.

    ``bf16=True`` runs every supporting sub-network's matmuls in bfloat16
    on the MXU (params, LayerNorm, heads, and losses stay f32) — roughly
    2x matmul throughput on TPU for a bounded numerics drift.
    """
    actor_cfg, critic_cfg = deepcopy(dict(actor_cfg)), deepcopy(dict(critic_cfg))
    is_discrete = bool(env_params.get("is_discrete", False))
    action_shape = env_params.get("action_shape")
    action_space = env_params.get("action_space")
    if shared_target_backbone is None:
        shared_target_backbone = shared_backbone

    actor_type = actor_cfg.pop("type", "ContinuousActor")
    critic_type = critic_cfg.pop("type", "ContinuousCritic")
    num_q = int(critic_cfg.pop("num_heads", 1))
    share_feature = bool(critic_cfg.pop("share_feature", False))
    average_grad = bool(critic_cfg.pop("average_grad", True))

    # ---- actor --------------------------------------------------------
    actor_nn_cfg = actor_cfg.get("nn_cfg") or {}
    rnn_cfg = dict(actor_nn_cfg).get("rnn_cfg")
    rnn = build_all(rnn_cfg) if rnn_cfg else None
    actor_visual_cfg, actor_mlp_cfg = _split_nn_cfg(actor_cfg.get("nn_cfg"))
    if bf16:
        actor_visual_cfg = _inject_dtype(actor_visual_cfg, "bfloat16")
        actor_mlp_cfg = _inject_dtype(actor_mlp_cfg, "bfloat16")
    head_cfg = _head_cfg_with_bound(actor_cfg.get("head_cfg"), action_space if not is_discrete else None)
    if head_cfg is not None:
        if is_discrete or "Discrete" in str(actor_type):
            head_cfg.setdefault("num_choices", int(np.prod(action_shape)))
        else:
            head_cfg.setdefault("dim_output", int(np.prod(action_shape)))
    visual = build_all(actor_visual_cfg)
    actor_final_mlp = None
    if actor_mlp_cfg is not None:
        kwargs = _mlp_kwargs(actor_mlp_cfg)
        from .blocks import MLP

        actor_final_mlp = MLP(**kwargs)
    head = build_all(head_cfg)
    actor = ActorHead(final_mlp=actor_final_mlp, head=head)

    # ---- critic -------------------------------------------------------
    critic_visual_cfg, critic_mlp_cfg = _split_nn_cfg(critic_cfg.get("nn_cfg"))
    if bf16:
        critic_visual_cfg = _inject_dtype(critic_visual_cfg, "bfloat16")
        critic_mlp_cfg = _inject_dtype(critic_mlp_cfg, "bfloat16")
    critic_visual = None
    if not shared_backbone and critic_visual_cfg is not None:
        critic_visual = build_all(critic_visual_cfg)
    elif shared_backbone:
        # builder.py:48-73: critic's visual cfg is discarded; the actor's
        # visual subtree is read by both.
        critic_visual = None
    elif critic_visual_cfg is None and visual is not None and not shared_backbone:
        # Critic configured without its own visual but sharing disabled:
        # build an independent copy from the actor's cfg.
        critic_visual = build_all(actor_visual_cfg)

    assert critic_mlp_cfg is not None, "Critic requires an MLP (Visuomotor mlp_cfg or plain MLP nn_cfg)"
    critic = CriticEnsemble(mlp_kwargs=_mlp_kwargs(critic_mlp_cfg), num_heads=num_q)

    return ActorCriticModel(
        visual=visual,
        critic_visual=critic_visual,
        actor=actor,
        critic=critic,
        shared_backbone=shared_backbone,
        shared_target_backbone=shared_target_backbone,
        is_discrete=is_discrete,
        num_q=num_q,
        share_feature=share_feature,
        average_grad=average_grad,
        rnn=rnn,
    )


def init_actor_critic_params(model: ActorCriticModel, rng, example_obs, example_action):
    params = model.init_params(rng, example_obs, example_action)
    target_params = model.init_target_params(params)
    return params, target_params
