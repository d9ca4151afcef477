"""Offline training mode: collect -> HDF5 export -> train with n_steps=0
from buffer files (reference train_rl offline path + FileCache role)."""

import numpy as np
import pytest

from pointcloud_rl_tpu.algorithms import build_agent
from pointcloud_rl_tpu.apis.train_rl import train_rl
from pointcloud_rl_tpu.env import ReplayMemory, Rollout
from tests.test_algorithms import _state_agent_cfg


class _RandomPolicy:
    def __init__(self, dim):
        self.dim = dim

    def __call__(self, obs, mode="explore"):
        n = len(obs) if not isinstance(obs, dict) else len(next(iter(obs.values())))
        return np.random.RandomState(0).uniform(-1, 1, (n, self.dim)).astype(np.float32)


def test_offline_training_from_hdf5(tmp_path):
    # 1) collect transitions on the synthetic env and export
    ro = Rollout(env_cfg=dict(type="gym", env_name="reacher3d_easy-v0", obs_mode="state"), num_procs=1, base_seed=0)
    mem = ReplayMemory(capacity=128)
    try:
        ro.forward_with_policy(None, 64, mem)
    finally:
        ro.close()
    data_file = str(tmp_path / "demo.h5")
    mem.to_hdf5(data_file)

    # 2) offline: replay loads the file, n_steps=0, no rollout
    replay = ReplayMemory(capacity=128, buffer_filenames=[data_file], seed=1)
    assert len(replay) == 64
    agent = build_agent(_state_agent_cfg(obs_dim=4, action_dim=3))
    train_rl(
        agent=agent,
        rollout=None,
        evaluator=None,
        replay=replay,
        work_dir=str(tmp_path / "run"),
        total_steps=10,
        warm_steps=0,
        n_steps=0,
        n_updates=2,
        n_log=5,
        n_checkpoint=-1,
    )
    import os

    assert os.path.exists(str(tmp_path / "run" / "models" / "model_final"))


def test_replay_snapshot_on_checkpoint(tmp_path):
    """save_replay=N writes models/replay_latest.h5 alongside checkpoints."""
    import os

    from pointcloud_rl_tpu.env import Rollout

    ro = Rollout(env_cfg=dict(type="gym", env_name="reacher3d_easy-v0", obs_mode="state"), num_procs=1, base_seed=0)
    mem = ReplayMemory(capacity=64)
    agent = build_agent(_state_agent_cfg(obs_dim=4, action_dim=3))
    try:
        train_rl(
            agent=agent, rollout=ro, evaluator=None, replay=mem,
            work_dir=str(tmp_path), total_steps=20, warm_steps=8,
            n_steps=1, n_updates=1, n_log=10, n_checkpoint=10, save_replay=16,
        )
    finally:
        ro.close()
    snap = os.path.join(str(tmp_path), "models", "replay_latest.h5")
    assert os.path.exists(snap)
    mem2 = ReplayMemory(capacity=64, buffer_filenames=[snap])
    assert len(mem2) == 16
