"""Checkpoint I/O: orbax over the agent's train-state pytree.

Parity target: reference ``pyrl/utils/torch/checkpoint_utils.py`` — one
checkpoint per step containing model params AND optimizer states (the
reference embeds optimizer state_dicts into the model state_dict), saved as
``models/model_<step>`` with a ``model_final`` alias, plus the auto-resume
scan over the work dir (reference run_rl.py:177-202).
"""

from __future__ import annotations

import os
import os.path as osp
import re
from typing import Any, Optional, Tuple

import jax
import numpy as np


def save_checkpoint(state: Any, work_dir: str, step: int, name: Optional[str] = None) -> str:
    """Serialize a pytree train state to ``work_dir/models/model_<step>``."""
    import orbax.checkpoint as ocp

    models_dir = osp.join(osp.abspath(work_dir), "models")
    os.makedirs(models_dir, exist_ok=True)
    path = osp.join(models_dir, name or f"model_{step}")
    ckpt = ocp.StandardCheckpointer()
    ckpt.save(path, jax.device_get(state), force=True)
    ckpt.wait_until_finished()
    return path


def load_checkpoint(path: str, example_state: Any, keys_map: Optional[dict] = None) -> Any:
    """Restore a pytree with the structure/dtypes of ``example_state``.

    ``keys_map``: optional {regex: replacement} applied to top-level param
    keys of the restored tree before structural matching (reference
    --resume-keys-map, checkpoint_utils.py:148-179 key rewriting).
    """
    import orbax.checkpoint as ocp

    ckpt = ocp.StandardCheckpointer()
    target = jax.tree_util.tree_map(np.asarray, jax.device_get(example_state))
    restored = ckpt.restore(osp.abspath(path), target)
    if keys_map:
        restored = remap_keys(restored, keys_map)
    return restored


def remap_keys(tree: Any, keys_map: dict) -> Any:
    """Rename dict keys (recursively) by regex substitution."""
    if not isinstance(tree, dict):
        return tree
    out = {}
    for k, v in tree.items():
        nk = k
        for pat, rep in keys_map.items():
            nk = re.sub(pat, rep, nk)
        out[nk] = remap_keys(v, keys_map)
    return out


def find_checkpoint(work_dir: str) -> Tuple[Optional[str], int]:
    """Latest ``models/model_<step>`` under work_dir (auto-resume scan)."""
    models_dir = osp.join(work_dir, "models")
    if not osp.isdir(models_dir):
        return None, 0
    best, best_step = None, -1
    for name in os.listdir(models_dir):
        m = re.fullmatch(r"model_(\d+)", name)
        if m and int(m.group(1)) > best_step:
            best, best_step = osp.join(models_dir, name), int(m.group(1))
    if best is None and osp.exists(osp.join(models_dir, "model_final")):
        return osp.join(models_dir, "model_final"), 0
    return best, max(best_step, 0)
