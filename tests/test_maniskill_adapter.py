"""Execute the sapien-gated ManiSkill adapter against a MOCK SAPIEN stack.

The real sapien package cannot be installed here (zero egress — documented
in PARITY.md), so these tests inject fake ``sapien`` / ``mani_skill.env`` /
``gym`` modules and drive ``build_maniskill_env`` end-to-end: the classic-gym
construction path, ``set_env_mode``, and the observation contract
(reference pyrl/env/maniskill_wrappers.py:142-199) — {xyz, rgb uint8, seg,
state} channel-first with the seg-aware balanced downsample, target_info
appended to the state, and image-mode CHW transposes."""

import sys
import types

import numpy as np
import pytest


class _FakeManiSkillEnv:
    """Reference-shaped ManiSkill env: SAPIEN fused pointcloud obs dicts
    {pointcloud: {xyz, rgb float01, seg bool}, agent: state} plus
    set_env_mode / level semantics."""

    def __init__(self, n_raw=5000, n_seg=3, with_target_info=False):
        self.n_raw = n_raw
        self.n_seg = n_seg
        self.with_target_info = with_target_info
        self.obs_mode = None
        self.rng = np.random.RandomState(0)
        self.action_space = types.SimpleNamespace(shape=(13,), seed=lambda s: None)

    def set_env_mode(self, obs_mode=None, reward_type=None):
        self.obs_mode = obs_mode

    def _obs(self):
        if self.obs_mode == "state":
            return np.zeros(38, np.float32)
        xyz = self.rng.uniform(-1, 1, (self.n_raw, 3)).astype(np.float32)
        xyz[:, 2] = np.abs(xyz[:, 2])
        xyz[:100, 2] = 0.0  # ground points for the pcd_base ground split
        seg = np.zeros((self.n_raw, self.n_seg), bool)
        seg[100:220, 0] = True
        seg[220:400, 1] = True
        seg[400:900, 2] = True
        obs = {
            "pointcloud": {
                "xyz": xyz,
                "rgb": self.rng.uniform(0, 1, (self.n_raw, 3)).astype(np.float32),
                "seg": seg,
            },
            "agent": np.arange(38, dtype=np.float32),
        }
        if self.with_target_info:
            obs["target_info"] = np.array([1.0, 0.0], np.float32)
        return obs

    def reset(self, level=None):
        self.level = level
        return self._obs()

    def step(self, action):
        return self._obs(), 0.5, False, {"eval_info": {"success": False}}


@pytest.fixture()
def mock_sapien_stack(monkeypatch):
    """Install fake sapien / mani_skill.env / classic gym into sys.modules."""
    made = {}

    fake_gym = types.ModuleType("gym")

    def make(env_name, **kwargs):
        env = _FakeManiSkillEnv(**kwargs.pop("fake_kwargs", {}))
        made["env"] = env
        made["name"] = env_name
        return env

    fake_gym.make = make
    fake_mani = types.ModuleType("mani_skill")
    fake_mani_env = types.ModuleType("mani_skill.env")
    fake_mani.env = fake_mani_env
    monkeypatch.setitem(sys.modules, "sapien", types.ModuleType("sapien"))
    monkeypatch.setitem(sys.modules, "mani_skill", fake_mani)
    monkeypatch.setitem(sys.modules, "mani_skill.env", fake_mani_env)
    monkeypatch.setitem(sys.modules, "gym", fake_gym)
    return made


def test_gate_raises_without_sapien():
    from pointcloud_rl_tpu.env.maniskill import build_maniskill_env

    if "sapien" in sys.modules:
        pytest.skip("real sapien present")
    with pytest.raises(ImportError, match="sapien"):
        build_maniskill_env("OpenCabinetDoor-v0")


def test_pointcloud_contract(mock_sapien_stack):
    from pointcloud_rl_tpu.env.maniskill import build_maniskill_env

    env = build_maniskill_env("OpenCabinetDoor-v0", obs_mode="pointcloud",
                              n_points=640)
    assert mock_sapien_stack["name"] == "OpenCabinetDoor-v0"
    assert mock_sapien_stack["env"].obs_mode == "pointcloud"
    obs = env.reset(level=7)
    assert mock_sapien_stack["env"].level == 7
    assert obs["xyz"].shape == (3, 640) and obs["xyz"].dtype == np.float32
    assert obs["rgb"].shape == (3, 640) and obs["rgb"].dtype == np.uint8
    assert obs["seg"].shape == (3, 640)
    assert obs["state"].shape == (38,) and obs["state"][5] == 5.0
    # seg-aware balance: every seg channel survives the downsample
    assert all(obs["seg"][c].sum() > 0 for c in range(3))
    obs2, r, d, info = env.step(np.zeros(13, np.float32))
    assert r == 0.5 and not d and obs2["xyz"].shape == (3, 640)


def test_target_info_appended_to_state(mock_sapien_stack):
    from pointcloud_rl_tpu.env.maniskill import build_maniskill_env

    env = build_maniskill_env("PushChair-v0", obs_mode="pointcloud",
                              fake_kwargs=dict(with_target_info=True))
    obs = env.reset()
    # maniskill_wrappers.py:158-163: state = concat[state, target_info]
    assert obs["state"].shape == (40,)
    assert obs["state"][-2:].tolist() == [1.0, 0.0]


def test_state_mode_passthrough(mock_sapien_stack):
    from pointcloud_rl_tpu.env.maniskill import build_maniskill_env

    env = build_maniskill_env("MoveBucket-v0", obs_mode="state")
    obs = env.reset()
    assert isinstance(obs, np.ndarray) and obs.shape == (38,)
