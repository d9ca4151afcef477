"""Regression tests for the round-1 correctness defects (VERDICT/ADVICE):
next_obs corruption by auto-reset, eval num < num_envs, whole-episode
(horizon=-1) window sampling, DDPG target policy network, and the one-sided
DistVar used by the DD-PPO straggler cutoff.
"""

import os
import subprocess
import sys
import textwrap

import numpy as np
import pytest

from pointcloud_rl_tpu.env import Evaluation, ReplayMemory, build_vec_env

DIST_CFG = dict(type="gym", env_name="reacher3d_easy-v0", obs_mode="pointcloud")


def test_step_dict_next_obs_survives_autoreset():
    """The auto-reset must not overwrite the returned transition's next_obs
    with the NEW episode's first observation (reference copies step results
    before resetting, vec_env.py:194-226)."""
    vec = build_vec_env(DIST_CFG, num_procs=1, base_seed=3)
    try:
        vec.reset()
        trans = vec.step_dict(vec.random_actions())
        assert trans["episode_dones"].all()  # DistEnv episodes are one step
        # the auto-reset already ran; the returned next_obs must not alias
        # the (reset) recent_obs buffer
        assert not np.shares_memory(trans["next_obs"]["xyz"], vec.recent_obs["xyz"])
        # and the values must differ: the reset re-randomizes the target
        assert not np.allclose(trans["next_obs"]["xyz"], vec.recent_obs["xyz"])
    finally:
        vec.close()


def test_evaluation_fewer_episodes_than_envs(tmp_path):
    """num < num_envs must not over-index the per-slot episode table."""
    vec_cfg = dict(DIST_CFG)
    ev = Evaluation(env_cfg=vec_cfg, num_procs=2, num=1, seed=7)
    try:
        pi = lambda obs, mode=None: np.stack([ev.vec_env.single_action_space.sample() for _ in range(2)])
        lens, rewards, finishes = ev.run(pi, num=1, work_dir=str(tmp_path / "eval"))
        assert len(lens) == 1 and len(rewards) == 1 and len(finishes) == 1
    finally:
        ev.close()


def _push_episodes(mem, episodes):
    for w, length, base in episodes:
        for t in range(length):
            mem.push_batch(dict(
                obs=np.array([[base + t]], np.float32),
                episode_dones=np.array([[t == length - 1]]),
                worker_indices=np.array([[w]], np.int32),
            ))


def test_tstep_whole_episode_sampling():
    """horizon=-1 returns WHOLE episodes (reference sampling_strategy.py:
    105-246), not 1-step windows."""
    mem = ReplayMemory(capacity=64, sampling_cfg=dict(type="TStepTransition", horizon=-1, seed=0))
    _push_episodes(mem, [(0, 5, 100), (1, 3, 200), (0, 7, 300)])
    batch = mem.sample_windows(16)
    obs = np.asarray(batch["obs"])[..., 0]
    mask = np.asarray(batch["is_valid"])
    assert obs.shape[1] >= 3  # width follows the longest SAMPLED episode
    lengths = mask.sum(1)
    # every sampled window is exactly one complete episode
    for b in range(16):
        n = int(lengths[b])
        assert n in (5, 3, 7)
        vals = obs[b, :n]
        np.testing.assert_array_equal(vals - vals[0], np.arange(n))  # consecutive
        assert vals[0] % 100 == 0  # starts at an episode start
        # padding repeats the last in-episode index (never leaks other episodes)
        assert (obs[b, n:] == vals[-1]).all()


def test_tstep_whole_episode_max_horizon_cap():
    mem = ReplayMemory(capacity=64, sampling_cfg=dict(type="TStepTransition", horizon=-1, seed=0, max_horizon=4))
    _push_episodes(mem, [(0, 9, 100)])
    batch = mem.sample_windows(4)
    assert np.asarray(batch["obs"]).shape[1] == 4


def test_ddpg_uses_target_actor():
    from pointcloud_rl_tpu.algorithms import build_agent

    class _Box:
        def __init__(self, shape):
            self.low = np.full(shape, -2.0, np.float32)
            self.high = np.full(shape, 2.0, np.float32)
            self.shape = shape

        def is_bounded(self):
            return True

    cfg = dict(
        type="DDPG",
        batch_size=16,
        actor_cfg=dict(
            nn_cfg=dict(type="LinearMLP", mlp_spec=[3, 32, 2], inactivated_output=True),
            head_cfg=dict(type="TanhHead"),
            optim_cfg=dict(type="Adam", lr=1e-3),
        ),
        critic_cfg=dict(
            num_heads=2,
            nn_cfg=dict(type="LinearMLP", mlp_spec=[5, 32, 1], inactivated_output=True),
            optim_cfg=dict(type="Adam", lr=1e-3),
        ),
        env_params=dict(is_discrete=False, obs_shape=3, action_shape=2, action_space=_Box((2,))),
        update_coeff=0.05,
    )
    agent = build_agent(cfg)
    assert "actor" in agent.train_state.target_params, "DDPG must keep a target policy network"

    import jax

    before_target = jax.device_get(agent.train_state.target_params["actor"])
    rs = np.random.RandomState(0)
    data = dict(
        obs=rs.randn(64, 3).astype(np.float32),
        next_obs=rs.randn(64, 3).astype(np.float32),
        actions=np.clip(rs.randn(64, 2), -2, 2).astype(np.float32),
        rewards=rs.randn(64, 1).astype(np.float32),
        dones=np.zeros((64, 1), bool),
        episode_dones=np.zeros((64, 1), bool),
    )

    class _Mem:
        def sample(self, n):
            idx = rs.randint(0, 64, n)
            return {k: v[idx] for k, v in data.items()}

    for i in range(3):
        metrics = agent.update_parameters(_Mem(), i)
    assert np.isfinite(metrics["ddpg/critic_loss"])
    after_live = jax.device_get(agent.train_state.params["actor"])
    after_target = jax.device_get(agent.train_state.target_params["actor"])
    # target actor EMA-moved (toward the live actor), but is NOT the live actor
    moved = any(
        not np.allclose(a, b)
        for a, b in zip(jax.tree_util.tree_leaves(before_target), jax.tree_util.tree_leaves(after_target))
    )
    distinct = any(
        not np.allclose(a, b)
        for a, b in zip(jax.tree_util.tree_leaves(after_live), jax.tree_util.tree_leaves(after_target))
    )
    assert moved and distinct


_DISTVAR_WORKER = textwrap.dedent(
    """
    import os, sys, time
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    port, pid = sys.argv[1], int(sys.argv[2])
    jax.distributed.initialize(coordinator_address=f"localhost:{port}", num_processes=2, process_id=pid)
    from pointcloud_rl_tpu.parallel import DistVar
    v = DistVar("vote")
    if pid == 0:
        # fast host: finishes its quota immediately, announces, and leaves the
        # loop WITHOUT ever entering another vote call
        v.add(1)
    else:
        # slow host: keeps voting until at least half the hosts are done
        deadline = time.time() + 60
        while v.get() < 1:
            assert time.time() < deadline, "vote never observed"
            time.sleep(0.05)
    print(f"proc {pid} exited cleanly")
    """
)


def test_distvar_one_sided_vote_no_deadlock(tmp_path):
    """One host exits the collection loop early; the other must still observe
    its vote (the round-1 allgather DistVar deadlocked here)."""
    import socket

    s = socket.socket()
    s.bind(("", 0))
    port = s.getsockname()[1]
    s.close()
    script = tmp_path / "worker.py"
    script.write_text(_DISTVAR_WORKER)
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH=repo_root + os.pathsep + os.environ.get("PYTHONPATH", ""))
    procs = [
        subprocess.Popen([sys.executable, str(script), str(port), str(pid)], env=env,
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=120)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("DistVar vote deadlocked (process did not exit)")
        outs.append(out.decode())
        assert p.returncode == 0, out.decode()
    assert "proc 0 exited cleanly" in "".join(outs)
    assert "proc 1 exited cleanly" in "".join(outs)
