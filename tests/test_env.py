"""Env plane tests: DistEnv, wrappers, vec envs, replay ring buffer,
rollout collection, evaluation loop, obs processing."""

import os
import time

import numpy as np
import pytest

from pointcloud_rl_tpu.env import (
    DistEnv,
    Evaluation,
    ExtendedEnv,
    FrameStackWrapper,
    ReplayMemory,
    Rollout,
    TimeLimit,
    build_env,
    build_vec_env,
    get_env_info,
    true_done,
)
from pointcloud_rl_tpu.env.obs_process import pcd_base, pcd_uniform_downsample, sample_and_pad
from pointcloud_rl_tpu.env.spaces import Box


DIST_CFG = dict(type="gym", env_name="reacher3d_easy-v0", obs_mode="pointcloud")


def test_dist_env_basic():
    env = DistEnv(obs_mode="pointcloud")
    env.seed(0)
    obs = env.reset()
    assert obs["xyz"].shape == (3, 2) and obs["rgb"].shape == (3, 2)
    assert obs["rgb"].dtype == np.uint8
    a = env.action_space.sample()
    obs2, r, done, info = env.step(a)
    assert done and r <= 0
    # zero action towards target from known geometry gives better reward
    env.reset()
    perfect = (env.target_xyz - env.source_xyz) / env.max_dist
    _, r2, _, _ = env.step(perfect)
    assert r2 > -1e-6


def test_dist_env_state_and_rgbd_modes():
    for mode, check in [
        ("state", lambda o: o.shape == (4,)),
        ("rgb", lambda o: o["rgb"].shape == (3, 20, 20)),
        ("rgbd", lambda o: o["depth"].shape == (1, 20, 20)),
    ]:
        env = DistEnv(obs_mode=mode)
        env.seed(1)
        assert check(env.reset())


def test_extended_env_and_true_done():
    env = ExtendedEnv(TimeLimit(DistEnv(obs_mode="state"), 1), reward_scale=2.0)
    env.seed(0)
    env.reset()
    obs, r, done, info = env.step(env.action_space.sample())
    assert obs.dtype == np.float32
    assert "step_times" in info
    assert done
    # DistEnv terminates itself at step 1 -> not truncation
    assert bool(true_done(done, info))
    assert not bool(true_done(True, {"TimeLimit.truncated": True}))
    assert not bool(true_done(True, {}))  # missing key defaults to truncated


def test_frame_stack_pointcloud():
    env = FrameStackWrapper(DistEnv(obs_mode="pointcloud"), 3)
    env.seed(0)
    obs = env.reset()
    assert obs["xyz"].shape == (3, 6)
    assert obs["pos_encoding"].shape == (3, 6)
    np.testing.assert_array_equal(obs["pos_encoding"][:, :2], np.eye(3, dtype=np.uint8)[:, [0, 0]])


def test_build_env_and_info():
    env = build_env(dict(DIST_CFG, stack_frame=3))
    info = get_env_info(dict(DIST_CFG, stack_frame=3))
    assert info["action_shape"] == 3 and not info["is_discrete"]
    assert info["obs_shape"]["xyz"] == (3, 6)
    assert info["obs_shape"]["pos_encoding"] == (3, 6)
    env.close()


def test_step_random_actions():
    env = build_env(DIST_CFG)
    env.seed(0)
    batch = env.step_random_actions(7)
    assert batch["actions"].shape == (7, 3)
    assert batch["rewards"].shape == (7, 1)
    assert batch["obs"]["xyz"].shape == (7, 3, 2)
    assert batch["episode_dones"].all()  # one-step env
    env.close()


def test_vec_env_subprocess_and_step_dict():
    vec = build_vec_env(DIST_CFG, num_procs=2, base_seed=10)
    try:
        obs = vec.reset()
        assert obs["xyz"].shape == (2, 3, 2)
        actions = vec.random_actions()
        trans = vec.step_dict(actions)
        for key in ("obs", "next_obs", "prev_actions", "actions", "rewards", "dones", "episode_dones", "worker_indices"):
            assert key in trans, key
        assert trans["rewards"].shape == (2, 1)
        assert trans["worker_indices"].tolist() == [[0], [1]]
        # auto-reset happened: recent_obs differs from next_obs of done envs
        assert trans["episode_dones"].all()
    finally:
        vec.close()


def test_replay_ring_and_wraparound():
    mem = ReplayMemory(capacity=10, sampling_cfg=dict(type="OneStepTransition"), seed=0)
    def batch(lo, n):
        return dict(
            obs=np.arange(lo, lo + n, dtype=np.float32)[:, None],
            actions=np.zeros((n, 2), np.float32),
            rewards=np.ones((n, 1), np.float32),
            dones=np.zeros((n, 1), bool),
            episode_dones=np.zeros((n, 1), bool),
            infos={"ignored": np.zeros(n)},
        )
    mem.push_batch(batch(0, 6))
    assert len(mem) == 6
    assert "infos" not in mem.memory
    mem.push_batch(batch(6, 6))  # wraps: positions 6..9 then 0..1
    assert len(mem) == 10
    assert mem.position == 2
    assert mem.memory["obs"][0, 0] == 10.0 and mem.memory["obs"][1, 0] == 11.0
    s = mem.sample(32)
    assert s["obs"].shape == (32, 1)
    tail = mem.tail(3)
    np.testing.assert_array_equal(tail["obs"][:, 0], [9.0, 10.0, 11.0])


def test_replay_trajectory_cache():
    mem = ReplayMemory(capacity=100)
    def trans(wid, done):
        return dict(
            obs=np.zeros((1, 2), np.float32),
            episode_dones=np.array([[done]]),
            worker_indices=np.array([[wid]]),
        )
    assert mem.cache_trajectories(trans(0, False)) == 0
    assert len(mem) == 0
    assert mem.cache_trajectories(trans(0, True)) == 2
    assert len(mem) == 2
    mem.cache_trajectories(trans(1, False))
    assert mem.push_cached_trajectories() == 1
    assert len(mem) == 3


def test_replay_hdf5_roundtrip(tmp_path):
    mem = ReplayMemory(capacity=16)
    mem.push_batch(dict(obs=np.arange(8, dtype=np.float32)[:, None], actions=np.zeros((8, 2), np.float32)))
    path = str(tmp_path / "replay.h5")
    mem.to_hdf5(path)
    mem2 = ReplayMemory(capacity=16, buffer_filenames=[path])
    assert len(mem2) == 8
    np.testing.assert_array_equal(mem2.memory["obs"][:8], mem.memory["obs"][:8])


def test_device_replay_hdf5_chunked_load(tmp_path):
    """DeviceReplayMemory.load_hdf5 streams the snapshot in fixed chunks
    (one small compile + pipelined uploads instead of a one-off multi-GB
    program); order and contents must survive the chunking, including a
    ragged tail chunk."""
    from pointcloud_rl_tpu.env import DeviceReplayMemory

    n = 18
    data = dict(
        obs=np.arange(n, dtype=np.float32)[:, None].repeat(3, 1),
        actions=np.linspace(-1, 1, 2 * n, dtype=np.float32).reshape(n, 2),
        rewards=np.arange(n, dtype=np.float32)[:, None],
    )
    src = DeviceReplayMemory(capacity=32, seed=0)
    src.push_batch(data)
    path = str(tmp_path / "replay.h5")
    src.to_hdf5(path)

    dst = DeviceReplayMemory(capacity=32, seed=0)
    dst.load_hdf5(path, chunk=7)  # 7 + 7 + 4: exercises the ragged tail
    assert len(dst) == n
    out = dst.get_all()
    for key in data:
        np.testing.assert_allclose(out[key], data[key], rtol=0, atol=0)


class _CountingPolicy:
    def __init__(self, action_dim=3):
        self.calls = 0
        self.action_dim = action_dim

    def __call__(self, obs, mode="explore"):
        self.calls += 1
        n = len(obs["xyz"]) if isinstance(obs, dict) else len(obs)
        return np.zeros((n, self.action_dim), np.float32)


def test_rollout_random_and_policy():
    mem = ReplayMemory(capacity=64)
    ro = Rollout(env_cfg=DIST_CFG, num_procs=1, base_seed=0)
    try:
        out = ro.forward_with_policy(None, 8, mem)
        assert len(mem) == 8
        assert out["_stats"]["num_steps"] == 8
        pi = _CountingPolicy()
        out = ro.forward_with_policy(pi, 4, mem)
        assert pi.calls == 4
        assert len(mem) == 12
        assert out["rewards"].shape == (1, 1)
        assert out["_stats"]["fps"] > 0
    finally:
        ro.close()


def test_evaluation_slot_reuse(tmp_path):
    ev = Evaluation(env_cfg=DIST_CFG, num_procs=1, num=3, seed=5)
    try:
        pi = _CountingPolicy()
        lens, rewards, finishes = ev.run(pi, num=3, work_dir=str(tmp_path / "eval"))
        assert len(lens) == 3 and len(rewards) == 3
        assert all(l == 1 for l in lens)  # one-step env
        assert (tmp_path / "eval" / "statistics.csv").exists()
    finally:
        ev.close()


def test_evaluation_writes_mp4_videos(tmp_path):
    """save_video=True writes a real, nonzero mp4 per episode (reference
    evaluation.py:139-144,196-199).  The image lacks imageio's FFMPEG
    plugin, so this also covers the cv2 mp4v fallback in VideoWriter."""
    ev = Evaluation(env_cfg=DIST_CFG, num_procs=1, num=2, seed=5, save_video=True)
    try:
        pi = _CountingPolicy()
        ev.run(pi, num=2, work_dir=str(tmp_path / "eval"))
    finally:
        ev.close()
    import os as _os

    vids = sorted((tmp_path / "eval").glob("episode_*.mp4"))
    assert [v.name for v in vids] == ["episode_0.mp4", "episode_1.mp4"]
    for v in vids:
        assert _os.path.getsize(v) > 100, f"{v} is empty"


def test_video_writer_frames_roundtrip(tmp_path):
    """VideoWriter encodes RGB frames into a decodable mp4 (cv2 can read
    back what it wrote; frame count and size must survive)."""
    from pointcloud_rl_tpu.env.evaluation import VideoWriter

    path = str(tmp_path / "clip.mp4")
    w = VideoWriter(path, fps=10)
    for i in range(6):
        frame = np.zeros((48, 64, 3), np.uint8)
        frame[:, : 8 * (i + 1)] = [255, 0, 0]
        w.append_data(frame)
    w.close()
    import cv2

    cap = cv2.VideoCapture(path)
    assert cap.isOpened()
    n = 0
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        assert frame.shape == (48, 64, 3)
        n += 1
    cap.release()
    assert n == 6


def test_sample_and_pad():
    idx = sample_and_pad(10, 4, np.random.RandomState(0))
    assert len(idx) == 4 and idx.max() < 10
    idx = sample_and_pad(3, 8)
    assert len(idx) == 8
    np.testing.assert_array_equal(idx, [0, 1, 2, 0, 1, 2, 0, 1])
    idx = sample_and_pad(0, 5)
    np.testing.assert_array_equal(idx, np.zeros(5))


def test_pcd_base_balanced_sampling():
    rs = np.random.RandomState(0)
    n = 3000
    obs = {
        "xyz": np.concatenate([rs.rand(n, 3) + [0, 0, 0.5], rs.rand(50, 3) * [1, 1, 1e-4]]),
        "rgb": rs.randint(0, 255, (n + 50, 3)).astype(np.uint8),
        "seg": np.zeros((n + 50, 2), bool),
    }
    obs["seg"][:30, 0] = True       # tiny segment -> gets all 30 (min_pts=50 > 30)
    obs["seg"][30:1500, 1] = True   # large segment
    out = pcd_base(dict(obs), n_points=1200, min_pts=50, fg_pts=800, np_random=rs, use_native=False)
    assert out["xyz"].shape == (1200, 3)
    assert out["seg"][:, 0].sum() == 30  # all of the tiny segment kept
    assert out["seg"][:, 1].sum() >= 700  # large segment dominates foreground budget
    assert (out["xyz"][:, 2] > 1e-3).all()  # ground removed


def test_pcd_uniform_downsample():
    rs = np.random.RandomState(1)
    obs = {"xyz": rs.rand(500, 3) + 0.1, "rgb": rs.rand(500, 3)}
    out = pcd_uniform_downsample(dict(obs), num=64, np_random=rs)
    assert out["xyz"].shape == (64, 3)


def test_one_step_sampling_no_replacement():
    from pointcloud_rl_tpu.env.sampling_strategy import OneStepTransition

    s = OneStepTransition(with_replacement=False, seed=0)
    seen = np.concatenate([s.sample(8, 32, 64) for _ in range(4)])
    assert sorted(seen) == list(range(32))  # one full epoch, no repeats
    s2 = OneStepTransition(no_random=True)
    np.testing.assert_array_equal(s2.sample(4, 10, 16), [0, 1, 2, 3])
    np.testing.assert_array_equal(s2.sample(4, 10, 16), [4, 5, 6, 7])


def test_mini_batch_sampler():
    mem = ReplayMemory(capacity=32)
    mem.push_batch(dict(obs=np.arange(20, dtype=np.float32)[:, None]))
    chunks = list(mem.mini_batch_sampler(8, shuffle=False))
    assert [len(c["obs"]) for c in chunks] == [8, 8, 4]
    assert np.concatenate([c["obs"][:, 0] for c in chunks]).tolist() == list(range(20))
    chunks = list(mem.mini_batch_sampler(8, drop_last=True))
    assert [len(c["obs"]) for c in chunks] == [8, 8]


def test_vec_env_thread_backend():
    """ThreadBasedVectorEnv (SapienThreadEnv analogue, reference
    vec_env.py:822-918): in-process thread stepping through the Unified API —
    step_dict, async/poll/wait on partial groups, random warm-up, call/attr."""
    vec = build_vec_env(DIST_CFG, num_procs=3, base_seed=10, vec_backend="thread")
    try:
        from pointcloud_rl_tpu.env.vec_env import ThreadBasedVectorEnv

        assert isinstance(vec.vec_env, ThreadBasedVectorEnv)
        obs = vec.reset()
        assert obs["xyz"].shape == (3, 3, 2)
        actions = vec.random_actions()
        trans = vec.step_dict(actions)
        for key in ("obs", "next_obs", "prev_actions", "actions", "rewards",
                    "dones", "episode_dones", "worker_indices"):
            assert key in trans, key
        assert trans["rewards"].shape == (3, 1)

        # partial async stepping (the pipelined rollout's access pattern)
        idx = np.array([0, 2])
        vec.step_dict_async(actions[idx], idx=idx)
        while not vec.step_dict_poll(idx=idx):
            pass
        part = vec.step_dict_wait(idx=idx)
        assert part["worker_indices"].reshape(-1).tolist() == [0, 2]

        # random warm-up path with worker index attribution
        batch = vec.step_random_actions(6)
        assert batch["worker_indices"].max() <= 2
        assert len(batch["rewards"]) == 6

        # call / get_attr fan-out
        assert len(vec.call("get_env_state")) == 3
        assert vec.get_attr("is_discrete") is False
    finally:
        vec.close()


def test_vec_env_thread_matches_subprocess():
    """Same seeds -> same first-step transition in thread and subprocess
    backends (the backend must not change env semantics)."""
    a = build_vec_env(DIST_CFG, num_procs=2, base_seed=7, vec_backend="thread")
    b = build_vec_env(DIST_CFG, num_procs=2, base_seed=7)
    try:
        oa, ob = a.reset(), b.reset()
        np.testing.assert_allclose(oa["xyz"], ob["xyz"])
        act = np.full((2,) + np.asarray(a.single_action_space.sample()).shape, 0.1, np.float32)
        ta, tb = a.step_dict(act.copy()), b.step_dict(act.copy())
        np.testing.assert_allclose(ta["rewards"], tb["rewards"], rtol=1e-6)
        np.testing.assert_allclose(ta["next_obs"]["xyz"], tb["next_obs"]["xyz"], rtol=1e-6)
    finally:
        a.close()
        b.close()


class _AsyncSpyPolicy:
    """forward_async fake for the pipelined path: returns a future-like
    wrapper whose value encodes WHICH obs the policy saw (the xyz mean), so
    tests can assert the applied-action <-> obs pairing."""

    class _Fut:
        def __init__(self, val):
            self.val = val

        def is_ready(self):
            return True

        def __array__(self, dtype=None, copy=None):
            return self.val

    def __init__(self, action_dim=3):
        self.action_dim = action_dim
        self.dispatched = []

    def forward_async(self, obs, mode="explore"):
        xyz = obs["xyz"] if isinstance(obs, dict) else obs
        tag = np.asarray(xyz, np.float64).reshape(len(xyz), -1).mean(axis=1)
        self.dispatched.append(tag.copy())
        act = np.zeros((len(xyz), self.action_dim), np.float32)
        act[:, 0] = np.clip(tag, -1, 1)  # action channel 0 fingerprints the obs
        return self._Fut(act)

    def __call__(self, obs, mode="explore"):
        return np.asarray(self.forward_async(obs, mode=mode))


def test_rollout_action_lag_applies_previous_dispatch():
    """action_lag=1 (SEED-RL-style pipelined acting): the action applied at
    group-step t is the one dispatched at t-1 — i.e. pi(o_{t-2}) relative to
    the stepped obs — and the pending future persists across collection
    calls (training collects once per cycle)."""
    from pointcloud_rl_tpu.env import Rollout
    from pointcloud_rl_tpu.env.replay import ReplayMemory

    env_cfg = dict(type="gym", env_name="FakeManipulation-v0", obs_mode="pointcloud",
                   n_points=24, n_raw_points=100, horizon=64)
    ro = Rollout(env_cfg=env_cfg, num_procs=2, base_seed=0,
                 pipeline_groups=1, action_lag=1)
    try:
        pi = _AsyncSpyPolicy(action_dim=ro.vec_env.single_action_space.shape[0])
        mem = ReplayMemory(capacity=64)
        for _ in range(4):  # four separate collection calls of 1 step/env
            ro.forward_with_policy(pi, 2, mem)
        acts = mem.get_all()["actions"][:, 0]  # fingerprint channel
        disp = [np.clip(d, -1, 1) for d in pi.dispatched]
        # 4 calls x 1 group-step each -> 4 dispatches; 2 envs per step
        assert len(disp) == 4 and len(acts) == 8
        applied = acts.reshape(4, 2)
        # priming: step 0 applies dispatch 0; thereafter step t applies
        # dispatch t-1 (carried across forward_with_policy calls)
        np.testing.assert_allclose(applied[0], disp[0], rtol=1e-6)
        for t in range(1, 4):
            np.testing.assert_allclose(applied[t], disp[t - 1], rtol=1e-6)
        # and the lagged pairing is real: dispatch t-1 saw obs t-1 != obs t
        assert not np.allclose(disp[1], disp[2])
    finally:
        ro.close()


def test_env_workers_survive_group_sigterm():
    """coreutils `timeout` (and most schedulers) TERM the whole process
    GROUP, so env workers receive the trainer's preemption signal too.  The
    graceful-preemption window needs them alive to finish the cycle
    (vec_env._worker_loop ignores TERM/INT; the parent still owns teardown
    via the exit command)."""
    import signal as sig

    vec = build_vec_env(DIST_CFG, num_procs=2, base_seed=11)
    try:
        vec.reset()
        pids = [w.proc.pid for w in vec.vec_env.workers]
        for p in pids:
            os.kill(p, sig.SIGTERM)
        time.sleep(0.5)
        # workers must still serve a full step round-trip after the TERM
        trans = vec.step_dict(vec.random_actions())
        assert trans["rewards"].shape == (2, 1)
        procs = [w.proc for w in vec.vec_env.workers]
        assert all(p.is_alive() for p in procs)
    finally:
        vec.close()
    for p in procs:
        p.join(timeout=10)
        assert not p.is_alive()  # exit command still tears them down
