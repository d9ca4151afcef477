"""Every shipped config must load, resolve placeholders, and build its
agent-model definitions (no param init — registry/type/shape-expression
errors surface without paying 29 jit compiles)."""

import glob

import numpy as np
import pytest

from pointcloud_rl_tpu import Config
from pointcloud_rl_tpu.models import build_actor_critic, get_kwargs_from_shape, replace_placeholder_with_args

CONFIGS = sorted(glob.glob("configs/mfrl/**/*.py", recursive=True))


def _fake_env_info(env_cfg):
    obs_mode = env_cfg.get("obs_mode", "state")
    stack = env_cfg.get("stack_frame", 1)
    name = env_cfg.get("env_name", "")
    is_dmc = name.startswith("dmc_") or name.startswith("reacher3d")
    action_shape = 6 if is_dmc else 8
    if obs_mode == "pointcloud":
        n = 128 * stack
        obs_shape = {"xyz": (3, n), "rgb": (3, n)}
        if stack > 1:
            obs_shape["pos_encoding"] = (stack, n)
        if not is_dmc:
            obs_shape["seg"] = (3, n)
            obs_shape["state"] = (38,)
    elif obs_mode in ("rgb", "rgbd"):
        size = tuple(np.atleast_1d(env_cfg.get("camera_size", env_cfg.get("image_size", 84)))[0] for _ in range(2))
        if name.startswith("PushChair") or not is_dmc:
            size = (50, 125)
        obs_shape = {"rgb": (3 * stack, *size)}
        if obs_mode == "rgbd":
            obs_shape["depth"] = (stack, *size)
        if not is_dmc:
            obs_shape["state"] = (38,)
    else:
        obs_shape = 24

    class _Box:
        low = -np.ones(action_shape, np.float32)
        high = np.ones(action_shape, np.float32)

        def is_bounded(self):
            return True

    return dict(obs_shape=obs_shape, action_shape=action_shape, action_space=_Box(), is_discrete=False)


@pytest.mark.parametrize("path", CONFIGS, ids=[p.split("configs/")[1] for p in CONFIGS])
def test_config_builds_model(path):
    cfg = Config.fromfile(path)
    agent_cfg = cfg["agent_cfg"].to_dict() if hasattr(cfg["agent_cfg"], "to_dict") else dict(cfg["agent_cfg"])
    env_cfg = dict(cfg["env_cfg"])
    env_info = _fake_env_info(env_cfg)
    kwargs = get_kwargs_from_shape(env_info["obs_shape"], env_info["action_shape"])
    agent_cfg = replace_placeholder_with_args(agent_cfg, **kwargs)

    assert agent_cfg["type"] in ("SAC", "DrQ")
    model = build_actor_critic(
        agent_cfg["actor_cfg"], agent_cfg["critic_cfg"], env_info,
        shared_backbone=agent_cfg.get("shared_backbone", False),
    )
    assert model.actor is not None and model.critic is not None
    if env_cfg.get("obs_mode") == "pointcloud":
        assert model.visual is not None
    # DrQ configs must carry a buildable augmentation pipeline
    if agent_cfg["type"] == "DrQ" and agent_cfg.get("obs_aug") is not None:
        from pointcloud_rl_tpu.ops.augment import build_data_augmentations

        assert build_data_augmentations(agent_cfg["obs_aug"]) is not None
