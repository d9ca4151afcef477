"""Optax optimizer construction with per-parameter regex config.

Parity target: reference ``pyrl/utils/torch/optimizer_utils.py`` —
``optim_cfg`` dicts like ``dict(type="Adam", lr=1e-3, betas=(0.5, 0.999),
param_cfg={"(.*?)visual_nn(.*?)": None})`` where a ``None`` value EXCLUDES
matching parameters from the optimizer (the reference's intended semantics;
its per-group override path was dead code).  Regexes match slash-joined
parameter paths; the shared visual subtree is exposed as ``visual_nn/...`` so
reference configs work verbatim.

Per-path EMA coefficients (reference ``pyrl/utils/torch/ops.py:60-100``
regex-dict soft_update) live here too.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Optional, Union

import jax
import jax.numpy as jnp
import optax

# Top-level param-tree keys -> path alias used for regex matching, so that
# reference regexes written against torch module names ("visual_nn") apply.
_PATH_ALIASES = {"visual": "visual_nn", "critic_visual": "visual_nn"}


def param_paths(params) -> Any:
    """Tree of slash-joined path strings, mirroring ``params``."""

    def _walk(node, prefix):
        if isinstance(node, dict):
            out = {}
            for k, v in node.items():
                name = _PATH_ALIASES.get(k, k) if not prefix else k
                out[k] = _walk(v, f"{prefix}/{name}" if prefix else name)
            return out
        return prefix

    return _walk(params, "")


def _first_match(patterns: Dict[str, Any], path: str):
    for pat, val in patterns.items():
        if re.search(pat, path):
            return True, val
    return False, None


def make_optimizer(optim_cfg: Optional[dict], params, extra_mask=None) -> optax.GradientTransformation:
    """Build an optax chain from an optim_cfg, honoring param_cfg exclusions.

    ``extra_mask``: optional pytree (or prefix dict) of bools ANDed with the
    param_cfg mask — used to restrict an optimizer to a subtree (e.g. the
    critic optimizer owns {critic, visual}).
    """
    cfg = dict(optim_cfg or {"type": "Adam", "lr": 3e-4})
    kind = cfg.pop("type", "Adam")
    lr = cfg.pop("lr", 3e-4)
    betas = cfg.pop("betas", (0.9, 0.999))
    eps = cfg.pop("eps", 1e-8)
    weight_decay = cfg.pop("weight_decay", 0.0)
    param_cfg = cfg.pop("param_cfg", None)
    max_grad_norm = cfg.pop("max_grad_norm", None)

    if kind.lower() in ("adam",):
        if weight_decay:
            base = optax.adamw(lr, b1=betas[0], b2=betas[1], eps=eps, weight_decay=weight_decay)
        else:
            base = optax.adam(lr, b1=betas[0], b2=betas[1], eps=eps)
    elif kind.lower() in ("adamw",):
        base = optax.adamw(lr, b1=betas[0], b2=betas[1], eps=eps, weight_decay=weight_decay)
    elif kind.lower() == "sgd":
        base = optax.sgd(lr, momentum=cfg.pop("momentum", 0.0), nesterov=cfg.pop("nesterov", False))
    elif kind.lower() == "rmsprop":
        base = optax.rmsprop(lr, eps=eps, momentum=cfg.pop("momentum", 0.0))
    else:
        raise KeyError(f"Unknown optimizer type {kind}")
    if max_grad_norm is not None:
        base = optax.chain(optax.clip_by_global_norm(max_grad_norm), base)

    paths = param_paths(params)

    def _leaf_mask(path_leaf: str, extra: bool) -> bool:
        if not extra:
            return False
        if param_cfg:
            matched, val = _first_match(param_cfg, path_leaf)
            if matched and val is None:
                return False
        return True

    if extra_mask is None:
        extra_tree = jax.tree_util.tree_map(lambda _: True, paths)
    else:
        # extra_mask given as {top_key: bool}; broadcast over subtrees.
        extra_tree = {k: jax.tree_util.tree_map(lambda _: bool(extra_mask.get(k, False)), v) if isinstance(v, dict) else bool(extra_mask.get(k, False)) for k, v in paths.items()}

    labels = jax.tree_util.tree_map(lambda p, e: "train" if _leaf_mask(p, e) else "frozen", paths, extra_tree)
    # multi_transform (not optax.masked): frozen leaves get zero updates
    # instead of passing raw gradients through.
    return optax.multi_transform({"train": base, "frozen": optax.set_to_zero()}, labels)


def build_tau_tree(update_coeff: Union[float, Dict[str, float]], target_params):
    """Per-leaf EMA coefficient tree from a float or regex-dict
    (reference soft_update with dict tau, ops.py:60-90)."""
    paths = param_paths(target_params)
    if not isinstance(update_coeff, dict):
        return jax.tree_util.tree_map(lambda _: float(update_coeff), paths)
    default = float(update_coeff.get("default", 0.005))

    def _tau(path: str) -> float:
        for pat, val in update_coeff.items():
            if pat == "default":
                continue
            if re.search(pat, path):
                return float(val)
        return default

    return jax.tree_util.tree_map(_tau, paths)


def soft_update(target_params, live_params, tau_tree):
    """target <- (1 - tau) * target + tau * live, per-leaf tau."""
    live_subset = {k: live_params[k] for k in target_params}
    return jax.tree_util.tree_map(
        lambda t, p, tau: t * (1.0 - tau) + p * tau, target_params, live_subset, tau_tree
    )


def global_grad_norm(grads, mask_keys=None) -> jnp.ndarray:
    if mask_keys is not None:
        grads = {k: v for k, v in grads.items() if k in mask_keys}
    leaves = jax.tree_util.tree_leaves(grads)
    if not leaves:
        return jnp.zeros(())
    return jnp.sqrt(sum(jnp.sum(jnp.square(g)) for g in leaves))
