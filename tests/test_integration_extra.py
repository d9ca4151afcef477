"""Cross-component integration: DrQ on HBM replay (fused sample+update with
augmentation), multi-proc evaluation, full-episode rollout collection."""

import numpy as np
import pytest

from pointcloud_rl_tpu.algorithms import build_agent
from pointcloud_rl_tpu.env import DeviceReplayMemory, Evaluation, ReplayMemory, Rollout
from tests.test_algorithms import _pcd_agent_cfg, _pcd_data


def test_drq_on_device_replay():
    agent = build_agent(_pcd_agent_cfg())  # DrQ with jitter aug
    mem = DeviceReplayMemory(capacity=256, seed=0)
    mem.push_batch(_pcd_data(n=64))
    m = agent.update_parameters(mem, 0)
    assert np.isfinite(m["drq/critic_loss"])
    # fused storage path built and reused
    assert agent._storage_update_jit is not None
    m2 = agent.update_parameters(mem, 1)
    assert np.isfinite(m2["drq/critic_loss"])


def test_multiproc_evaluation():
    ev = Evaluation(
        env_cfg=dict(type="gym", env_name="FakeManipulation-v0", obs_mode="pointcloud",
                     n_points=48, n_raw_points=300, horizon=5),
        num_procs=2, num=4, seed=3,
    )
    try:
        pi = lambda obs, mode="eval": np.zeros((len(obs["xyz"]), 8), np.float32)
        lens, rewards, finishes = ev.run(pi, num=4)
        assert len(lens) == 4
        assert all(l == 5 for l in lens)
    finally:
        ev.close()


def test_full_episode_rollout():
    ro = Rollout(
        env_cfg=dict(type="gym", env_name="FakeManipulation-v0", obs_mode="pointcloud",
                     n_points=48, n_raw_points=300, horizon=4),
        num_procs=2, base_seed=0, full_episode=True,
    )
    mem = ReplayMemory(capacity=128)
    try:
        pi = lambda obs, mode="explore": np.zeros((len(obs["xyz"]), 8), np.float32)
        ro.forward_with_policy(pi, 16, mem)
        assert len(mem) >= 16
        # only whole episodes were pushed: every 4th transition is an episode end
        dones = mem.memory["episode_dones"][: len(mem), 0]
        assert dones.reshape(-1, 4)[:, -1].all()
        assert not dones.reshape(-1, 4)[:, :-1].any()
    finally:
        ro.close()


def test_train_loop_interleaved_updates(tmp_path):
    """Pipelined rollout + DeviceReplayMemory + n_updates>1: the training
    loop dispatches update scans mid-collection (update_hook path) and the
    accounting (grad steps, logs, checkpoints) stays exact."""
    from pointcloud_rl_tpu.algorithms import build_agent
    from pointcloud_rl_tpu.apis.train_rl import train_rl
    from pointcloud_rl_tpu.env import DeviceReplayMemory, Rollout

    from tests.test_algorithms import _state_agent_cfg

    env_cfg = dict(type="gym", env_name="reacher3d_easy-v0", obs_mode="state")
    rollout = Rollout(env_cfg=env_cfg, num_procs=4, base_seed=0, pipeline_groups=2)
    agent = build_agent(_state_agent_cfg(obs_dim=4, action_dim=3, batch_size=16))
    replay = DeviceReplayMemory(capacity=512, seed=0)
    try:
        train_rl(
            agent, rollout, None, replay, work_dir=str(tmp_path),
            total_steps=48, warm_steps=16, n_steps=8, n_updates=8,
            n_log=16, n_eval=-1, n_checkpoint=-1,
        )
    finally:
        rollout.close()
    assert int(agent.train_state.updates) == 32  # (48-16)/8 cycles x 8 updates


def test_pipelined_single_group_with_hook(tmp_path):
    """pipeline_groups=1 + update_hook: one act batch per step for ALL envs
    (fewer device round trips when updates dominate) still dispatches the
    hook and collects exactly num steps."""
    import numpy as np

    from pointcloud_rl_tpu.algorithms import build_agent
    from pointcloud_rl_tpu.env import DeviceReplayMemory, Rollout

    from tests.test_algorithms import _state_agent_cfg

    env_cfg = dict(type="gym", env_name="reacher3d_easy-v0", obs_mode="state")
    rollout = Rollout(env_cfg=env_cfg, num_procs=4, base_seed=0, pipeline_groups=1)
    agent = build_agent(_state_agent_cfg(obs_dim=4, action_dim=3, batch_size=8))
    mem = DeviceReplayMemory(capacity=256, seed=0)
    try:
        rollout.forward_with_policy(None, 32, mem)  # warm-up fills the buffer
        calls = {"n": 0}

        def hook():
            calls["n"] += 1
            agent.update_parameters_scan(mem, 2)

        out = rollout.forward_with_policy(agent, 8, mem, update_hook=hook)
        assert calls["n"] == 2  # 8 steps / 4 envs = 2 group events
        assert int(agent.train_state.updates) == 4
        assert np.isfinite(out["rewards"]).all()
    finally:
        rollout.close()


def test_cold_resume_policy_warmup(tmp_path):
    """Resuming from a checkpoint WITHOUT a replay snapshot (the
    reference's only resume mode) must prefill the empty buffer — with the
    current policy, rounded up to a multiple of num_envs — before updates
    start sampling it."""
    from pointcloud_rl_tpu.apis.train_rl import train_rl
    from pointcloud_rl_tpu.env import Rollout

    from tests.test_algorithms import _state_agent_cfg

    env_cfg = dict(type="gym", env_name="reacher3d_easy-v0", obs_mode="state")
    rollout = Rollout(env_cfg=env_cfg, num_procs=2, base_seed=0)
    agent = build_agent(_state_agent_cfg(obs_dim=4, action_dim=3, batch_size=8))
    replay = DeviceReplayMemory(capacity=256, seed=0)
    try:
        train_rl(
            agent, rollout, None, replay, work_dir=str(tmp_path),
            total_steps=120, resume_steps=100, warm_steps=5,  # 5 -> 6 (2 envs)
            n_steps=2, n_updates=1, n_log=1000, n_eval=-1, n_checkpoint=-1,
        )
    finally:
        rollout.close()
    # warm 6 (policy) + remaining cycles of 2 up to total_steps
    assert len(replay) >= 6
    assert int(agent.train_state.updates) > 0


def test_cold_resume_warmup_does_not_consume_budget(tmp_path):
    """Regression (round-4 dryrun failure): a cold resume whose remaining
    budget is SMALLER than warm_steps must still perform gradient updates
    and log steps past the checkpoint — the policy refill is buffer
    maintenance and must not advance the global step counter
    (reference pyrl/apis/train_rl.py:207-231 never counts warm-up into the
    resumed counter)."""
    from pointcloud_rl_tpu.apis.train_rl import train_rl
    from pointcloud_rl_tpu.env import Rollout

    from tests.test_algorithms import _state_agent_cfg

    env_cfg = dict(type="gym", env_name="reacher3d_easy-v0", obs_mode="state")
    rollout = Rollout(env_cfg=env_cfg, num_procs=2, base_seed=0)
    agent = build_agent(_state_agent_cfg(obs_dim=4, action_dim=3, batch_size=8))
    replay = DeviceReplayMemory(capacity=256, seed=0)
    logged_steps = []

    class _Cap:
        def log(self, metrics, step=None, tag=None):
            logged_steps.append(step)

    try:
        # remaining budget (48-32=16) <= warm_steps (16): round-4 code did
        # zero updates and exited at steps==48 without entering the loop.
        train_rl(
            agent, rollout, None, replay, work_dir=str(tmp_path),
            total_steps=48, resume_steps=32, warm_steps=16,
            n_steps=2, n_updates=1, n_log=2, n_eval=-1, n_checkpoint=-1,
            exp_logger=_Cap(),
        )
    finally:
        rollout.close()
    assert int(agent.train_state.updates) == 8, "resumed run must perform (48-32)/2 updates"
    assert logged_steps and max(logged_steps) == 48
    assert min(logged_steps) > 32, "logged steps must continue past the checkpoint step"
    # refill capped at the remaining budget (16, already a num_envs multiple)
    assert len(replay) == 16 + 16


def test_sigterm_graceful_preemption(tmp_path):
    """SIGTERM mid-training finishes the cycle, writes a NUMBERED
    checkpoint (so --auto-resume continues from the preemption point, not
    from the last n_checkpoint multiple), and returns cleanly."""
    import os
    import signal
    import threading

    from pointcloud_rl_tpu.apis.train_rl import train_rl
    from pointcloud_rl_tpu.env import Rollout

    from tests.test_algorithms import _state_agent_cfg

    env_cfg = dict(type="gym", env_name="reacher3d_easy-v0", obs_mode="state")
    rollout = Rollout(env_cfg=env_cfg, num_procs=2, base_seed=0)
    agent = build_agent(_state_agent_cfg(obs_dim=4, action_dim=3, batch_size=8))
    replay = DeviceReplayMemory(capacity=512, seed=0)
    timer = threading.Timer(3.0, lambda: os.kill(os.getpid(), signal.SIGTERM))
    prev = signal.getsignal(signal.SIGTERM)
    try:
        timer.start()
        train_rl(
            agent, rollout, None, replay, work_dir=str(tmp_path),
            total_steps=1_000_000, warm_steps=16, n_steps=8, n_updates=1,
            n_log=1000, n_eval=-1, n_checkpoint=-1,
        )
    finally:
        timer.cancel()
        rollout.close()
    assert signal.getsignal(signal.SIGTERM) is prev  # handler restored
    models = sorted(os.listdir(str(tmp_path / "models")))
    numbered = [m for m in models if m != "model_final"]
    assert numbered, f"no numbered preemption checkpoint in {models}"
    step = int(numbered[0].split("_")[1])
    assert 16 <= step < 1_000_000


def test_pipelined_episode_stats_across_groups():
    """Episode accounting through the pipelined (grouped) rollout path:
    every transition must land on the RIGHT worker's accumulator even when
    two groups interleave act/step events.  DistEnv episodes are exactly one
    step long, so any cross-group row/worker mixup shows up as an episode of
    length != 1 (one worker double-counted, another starved)."""
    from pointcloud_rl_tpu.env import Rollout

    from tests.test_algorithms import _state_agent_cfg

    env_cfg = dict(type="gym", env_name="reacher3d_easy-v0", obs_mode="state")
    rollout = Rollout(env_cfg=env_cfg, num_procs=8, base_seed=0, pipeline_groups=2)
    agent = build_agent(_state_agent_cfg(obs_dim=4, action_dim=3, batch_size=16))
    mem = DeviceReplayMemory(capacity=1024, seed=0)
    try:
        rollout.forward_with_policy(None, 32, mem)  # warm-up
        rollout.episode_stats.reset_history()
        rollout.episode_stats.reset_current()
        out = rollout.forward_with_policy(agent, 8 * 6, mem, update_hook=lambda: None)
        st = rollout.episode_stats
        # num_episodes is lifetime; the history window holds this collection
        assert len(st.history_rewards) == 8 * 6
        assert all(length == 1 for length in st.history_lens)
        assert np.isfinite(st.history_rewards).all()
        # current accumulators drained: no half-finished episodes linger
        assert (st.current_lens == 0).all()
        assert np.isfinite(out["rewards"]).all()
    finally:
        rollout.close()


def test_act_fused_updates():
    """set_fused_updates arms the act-fused path: explore forwards carry
    gradient-step chunks inside the act program (one dispatch per group-step
    instead of separate act + update dispatches), budget accounting is exact,
    and non-explore forwards never fuse."""
    from tests.test_algorithms import _state_agent_cfg, _state_data

    agent = build_agent(_state_agent_cfg(obs_dim=4, action_dim=3, batch_size=16))
    mem = DeviceReplayMemory(capacity=256, seed=0)
    mem.push_batch(_state_data(n=64, obs_dim=4, action_dim=3))

    assert agent.set_fused_updates(mem, chunk=2, budget=4)
    obs = np.random.RandomState(1).randn(4, 4).astype(np.float32)
    a1 = agent.forward(obs, mode="explore")
    assert a1.shape == (4, 3)
    assert agent._fused_plan["done"] == 2
    a2 = agent.forward(obs, mode="explore")
    assert agent._fused_plan["done"] == 4
    # budget exhausted -> plain act path, no further updates
    a3 = agent.forward(obs, mode="explore")
    assert agent._fused_plan["done"] == 4
    vec, done = agent.finish_fused_updates()
    assert done == 4 and vec is not None
    assert int(agent.train_state.updates) == 4
    metrics = agent.reduce_metric_vecs(vec, done)
    assert all(np.isfinite(v) for v in metrics.values())
    assert agent._fused_plan is None  # disarmed

    # eval-mode forwards never fuse even while armed
    assert agent.set_fused_updates(mem, chunk=1, budget=8)
    agent.forward(obs, mode="eval")
    vec, done = agent.finish_fused_updates()
    assert done == 0 and vec is None

    # host replay refuses to arm
    host = ReplayMemory(capacity=64)
    assert not agent.set_fused_updates(host, chunk=1, budget=4)


def test_update_hook_fires_at_act_dispatch():
    """The update hook must fire right AFTER an act program is dispatched
    (so update chunks enqueue BEHIND it on the device queue) and never
    after a step dispatch — the relay-audited ordering that removed the
    head-of-line blocking of action fetches (tools/exp_overlap.py:
    89 -> 122 steps/s at groups=1/chunk=16)."""
    from pointcloud_rl_tpu.algorithms import build_agent
    from pointcloud_rl_tpu.env import DeviceReplayMemory, Rollout

    from tests.test_algorithms import _state_agent_cfg

    env_cfg = dict(type="gym", env_name="reacher3d_easy-v0", obs_mode="state")
    rollout = Rollout(env_cfg=env_cfg, num_procs=2, base_seed=0, pipeline_groups=1)
    agent = build_agent(_state_agent_cfg(obs_dim=4, action_dim=3, batch_size=8))
    mem = DeviceReplayMemory(capacity=128, seed=0)
    try:
        rollout.forward_with_policy(None, 16, mem)
        events = []
        orig_fwd = agent.forward_async
        agent.forward_async = lambda *a, **k: (events.append("act"), orig_fwd(*a, **k))[1]
        vec = rollout.vec_env
        orig_step = vec.step_dict_async
        vec.step_dict_async = lambda *a, **k: (events.append("step"), orig_step(*a, **k))[1]

        rollout.forward_with_policy(agent, 8, mem, update_hook=lambda: events.append("hook"))
        hooks = [i for i, e in enumerate(events) if e == "hook"]
        assert hooks, f"hook never fired: {events}"
        for i in hooks:
            assert events[i - 1] == "act", f"hook not right after act dispatch: {events}"
    finally:
        agent.forward_async = orig_fwd
        vec.step_dict_async = orig_step
        rollout.close()


def test_eager_push_matches_default():
    """eager_push flushes collected transitions at act-dispatch time (relay
    scheduling: the upload rides the fetch's idle round trip) — replay
    contents must equal the default end-of-call push exactly."""
    import numpy as np

    from pointcloud_rl_tpu.algorithms import build_agent
    from pointcloud_rl_tpu.env import DeviceReplayMemory, Rollout

    from tests.test_algorithms import _state_agent_cfg

    env_cfg = dict(type="gym", env_name="reacher3d_easy-v0", obs_mode="state")

    def collect(eager):
        rollout = Rollout(env_cfg=env_cfg, num_procs=4, base_seed=0,
                          pipeline_groups=1, eager_push=eager)
        agent = build_agent(_state_agent_cfg(obs_dim=4, action_dim=3, batch_size=8, seed=5))
        mem = DeviceReplayMemory(capacity=256, seed=0)
        try:
            rollout.forward_with_policy(agent, 16, mem)
        finally:
            rollout.close()
        return mem.get_all()

    a = collect(False)
    b = collect(True)
    assert set(a) == set(b)
    for k in a:
        np.testing.assert_allclose(
            np.asarray(a[k], np.float32), np.asarray(b[k], np.float32),
            rtol=0, atol=0, err_msg=k)
