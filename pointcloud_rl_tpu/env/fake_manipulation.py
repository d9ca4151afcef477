"""Synthetic manipulation environment with ManiSkill-shaped observations.

SAPIEN (the ManiSkill simulator) is host-side C++/Vulkan and not always
installed; this env emits the SAME observation structure the ManiSkill
wrapper produces — a segmented point cloud {xyz, rgb, seg} plus a robot
state vector — from a cheap procedural scene, so every ManiSkill config,
the seg-balanced sampler, and the full training stack can run and be tested
without the simulator.  It is a stand-in for pipeline testing, not a
physics benchmark; reward is a simple reach task.

Scene: a table plane (ground, z=0), a target object cluster, and a robot
end-effector cluster.  seg masks: [object, robot].  Action: displacement of
the end effector; dense reward = -distance(ee, object).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from .api import Env
from .obs_process import pcd_base
from .spaces import Box


class FakeManipulationEnv(Env):
    def __init__(
        self,
        obs_mode: str = "pointcloud",
        n_raw_points: int = 4000,
        n_points: int = 1200,
        state_dim: int = 32,
        action_dim: int = 8,
        horizon: int = 50,
        ego_mode: bool = False,
        image_size=(50, 125),
        **kwargs,  # accept & ignore ManiSkill flags (no_early_stop, ...)
    ):
        self.obs_mode = obs_mode
        self.n_raw = n_raw_points
        self.n_points = n_points
        self.state_dim = state_dim
        self.horizon = horizon
        self.ego_mode = ego_mode
        self.image_size = tuple(image_size)
        self.action_space = Box(-1.0, 1.0, (action_dim,))
        self.np_random = np.random.RandomState()
        self._step = 0

    def seed(self, seed):
        self.np_random.seed(seed)
        self.action_space.seed(seed)

    def reset(self, level: Optional[int] = None, **kwargs):
        if level is not None:
            self.np_random.seed(int(level))
        self._step = 0
        self.obj_pos = self.np_random.uniform([-0.4, -0.4, 0.1], [0.4, 0.4, 0.4]).astype(np.float32)
        self.ee_pos = self.np_random.uniform([-0.4, -0.4, 0.2], [0.4, 0.4, 0.6]).astype(np.float32)
        return self.get_obs()

    def _cloud(self):
        rs = self.np_random
        n_table = self.n_raw // 2
        n_obj = self.n_raw // 4
        n_robot = self.n_raw - n_table - n_obj
        table = np.stack([rs.uniform(-1, 1, n_table), rs.uniform(-1, 1, n_table), np.zeros(n_table)], -1)
        obj = self.obj_pos + rs.randn(n_obj, 3).astype(np.float32) * 0.03
        robot = self.ee_pos + rs.randn(n_robot, 3).astype(np.float32) * 0.04
        xyz = np.concatenate([table, obj, robot]).astype(np.float32)
        rgb = np.zeros((self.n_raw, 3), np.uint8)
        rgb[:n_table] = (120, 120, 120)
        rgb[n_table : n_table + n_obj] = (200, 40, 40)
        rgb[n_table + n_obj :] = (40, 40, 200)
        seg = np.zeros((self.n_raw, 2), bool)
        seg[n_table : n_table + n_obj, 0] = True  # object
        seg[n_table + n_obj :, 1] = True  # robot
        return xyz, rgb, seg

    def _state(self):
        s = np.zeros(self.state_dim, np.float32)
        s[:3] = self.ee_pos
        s[3:6] = self.obj_pos - self.ee_pos
        s[6] = self._step / max(self.horizon, 1)
        return s

    def get_obs(self):
        if self.obs_mode == "state":
            return self._state()
        xyz, rgb, seg = self._cloud()
        if self.ego_mode:
            xyz = xyz - self.ee_pos
        obs = {"xyz": xyz, "rgb": rgb, "seg": seg}
        # budget ratios follow pcd_base defaults (1200/50/800) scaled to n_points
        obs = pcd_base(
            obs,
            n_points=self.n_points,
            min_pts=max(self.n_points // 24, 1),
            fg_pts=self.n_points * 2 // 3,
            np_random=self.np_random,
        )
        out = {
            "xyz": np.ascontiguousarray(obs["xyz"].T.astype(np.float32)),
            "rgb": np.ascontiguousarray(obs["rgb"].T),
            "seg": np.ascontiguousarray(obs["seg"].T.astype(np.float32)),
            "state": self._state(),
        }
        return out

    def step(self, action):
        action = np.clip(np.asarray(action, np.float32), -1, 1)
        self.ee_pos = np.clip(self.ee_pos + action[:3] * 0.05, [-1, -1, 0.0], [1, 1, 1])
        self._step += 1
        dist = float(np.linalg.norm(self.ee_pos - self.obj_pos))
        reward = -dist
        success = dist < 0.05
        done = bool(success or self._step >= self.horizon)
        info = {"success": success}
        if done and not success:
            info["TimeLimit.truncated"] = True
        return self.get_obs(), reward, done, info

    def render(self, mode="rgb_array", **kwargs):
        h, w = self.image_size
        img = np.full((h, w, 3), 255, np.uint8)
        for pos, color in ((self.obj_pos, (200, 40, 40)), (self.ee_pos, (40, 40, 200))):
            r = int((pos[1] + 1) / 2 * (h - 1))
            c = int((pos[0] + 1) / 2 * (w - 1))
            img[max(r - 1, 0) : r + 2, max(c - 1, 0) : c + 2] = color
        return img

    def get_env_state(self):
        return {"ee_pos": self.ee_pos.copy(), "obj_pos": self.obj_pos.copy(), "step": self._step}
