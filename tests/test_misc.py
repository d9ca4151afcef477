"""Schedulers, GAE, env info, fake manipulation env, obs preprocessing."""

import os

import numpy as np
import pytest

from pointcloud_rl_tpu.schedulers import build_scheduler, build_lr_schedule
from pointcloud_rl_tpu.utils.collect_env import collect_env_info


def test_schedulers():
    s = build_scheduler(dict(type="Step", value=1.0, milestones=[10, 20], gamma=0.5))
    assert s.get(0) == 1.0 and s.get(10) == 0.5 and s.get(25) == 0.25
    s = build_scheduler(dict(type="KeyStep", keys=[0, 100], values=[0.3, 0.1]))
    assert s.get(50) == 0.3 and s.get(150) == 0.1
    s = build_scheduler(0.7)
    assert s.get(123) == 0.7
    s = build_scheduler(dict(type="Lmbda", value=2.0, fn="lambda t: 1 / (1 + t)"))
    assert s.get(1) == 1.0
    sched = build_lr_schedule(dict(type="linear", value=1.0, end_value=0.0, decay_steps=10))
    assert abs(float(sched(5)) - 0.5) < 1e-6


def test_compute_gae():
    from pointcloud_rl_tpu.algorithms.base import compute_gae

    T = 5
    rewards = np.ones((T, 1), np.float32)
    values = np.zeros((T, 1), np.float32)
    next_values = np.zeros((T, 1), np.float32)
    dones = np.zeros((T, 1), np.float32)
    adv, ret = compute_gae(rewards, values, next_values, dones, gamma=1.0, lam=1.0)
    # undiscounted, zero values: advantage at t = sum of future rewards
    np.testing.assert_allclose(np.asarray(adv)[:, 0], [5, 4, 3, 2, 1])
    np.testing.assert_allclose(np.asarray(ret), np.asarray(adv))
    # episode boundary cuts the accumulation
    dones[1] = 1.0
    adv2, _ = compute_gae(rewards, values, next_values, dones, gamma=1.0, lam=1.0)
    np.testing.assert_allclose(np.asarray(adv2)[:2, 0], [2, 1])


def test_collect_env_info():
    info = collect_env_info()
    assert "jax" in info and "git_commit" in info
    assert info["jax_backend"] in ("cpu", "tpu")


def test_fake_manipulation_env():
    from pointcloud_rl_tpu.env import build_env, get_env_info

    cfg = dict(type="gym", env_name="FakeManipulation-v0", obs_mode="pointcloud",
               n_points=300, n_raw_points=1500, reward_scale=0.3)
    env = build_env(cfg)
    env.seed(0)
    obs = env.reset()
    assert obs["xyz"].shape == (3, 300)
    assert obs["seg"].shape == (2, 300)
    assert obs["state"].shape == (32,)
    assert obs["rgb"].dtype == np.uint8
    # object & robot segments both present after balanced sampling
    assert obs["seg"][0].sum() >= 50 and obs["seg"][1].sum() >= 50
    # greedy action toward the object improves reward
    inner = env.env
    a = np.zeros(8, np.float32)
    a[:3] = np.clip((inner.obj_pos - inner.ee_pos) / 0.05, -1, 1)
    _, r1, _, _ = env.step(a)
    _, r2, _, _ = env.step(a)
    assert r2 > r1
    info = get_env_info(cfg)
    assert info["obs_shape"]["xyz"] == (3, 300)
    assert info["action_shape"] == 8
    env.close()


@pytest.mark.slow
def test_maniskill_config_runs_on_fake_env(tmp_path):
    """The ManiSkill DrQ config trains end-to-end on the synthetic env."""
    from pointcloud_rl_tpu.apis.run_rl import main

    main([
        "configs/mfrl/drq/maniskill/pn_shift.py",
        "--work-dir", str(tmp_path),
        "--seed", "0",
        "--cfg-options",
        "env_cfg.env_name=FakeManipulation-v0",
        "env_cfg.n_points=64", "env_cfg.n_raw_points=400", "env_cfg.horizon=8",
        "agent_cfg.batch_size=16",
        "agent_cfg.actor_cfg.nn_cfg.visual_nn_cfg.mlp_spec=[16,16,32]",
        "agent_cfg.actor_cfg.nn_cfg.visual_nn_cfg.out_channels=16",
        "agent_cfg.actor_cfg.nn_cfg.mlp_cfg.mlp_spec=['16+agent_shape',32,'action_shape*2']",
        "agent_cfg.critic_cfg.nn_cfg.mlp_cfg.mlp_spec=['16+agent_shape+action_shape',32,1]",
        "train_cfg.total_steps=40", "train_cfg.warm_steps=20",
        "train_cfg.n_log=20", "train_cfg.n_checkpoint=-1",
        "rollout_cfg.num_procs=2",
        "eval_cfg.save_video=False", "train_cfg.n_eval=-1",
    ])
    import os

    assert os.path.exists(os.path.join(str(tmp_path), "0", "models", "model_final"))


def test_sac_pre_process_augmentation():
    """pre_process augmentations apply inside the jitted SAC update."""
    from pointcloud_rl_tpu.algorithms import build_agent
    from tests.test_algorithms import FakeMemory, _pcd_agent_cfg, _pcd_data

    cfg = _pcd_agent_cfg()
    cfg["type"] = "SAC"
    cfg.pop("num_aug"), cfg.pop("obs_aug"), cfg.pop("svea", None)
    cfg["metric_prefix"] = "sac"
    cfg["pre_process"] = dict(type="RandomJitterPoints", main_key="xyz", req_keys=["xyz"],
                              jitter_range=[-0.01, 0.01])
    agent = build_agent(cfg)
    m = agent.update_parameters(FakeMemory(_pcd_data()), 0)
    assert np.isfinite(m["sac/critic_loss"])


def test_flops_counter():
    import jax.numpy as jnp

    from pointcloud_rl_tpu.models import build_all
    from pointcloud_rl_tpu.utils.flops import estimate_flops, model_report

    # matmul flops are exactly 2*M*N*K
    f = lambda a, b: a @ b
    flops = estimate_flops(f, jnp.zeros((64, 128)), jnp.zeros((128, 32)))
    assert abs(flops - 2 * 64 * 128 * 32) / flops < 0.01

    pn = build_all(dict(type="PointNet", feat_dim=6, mlp_spec=[16, 32], out_channels=16,
                        feature_transform=[], ignore_first_ln=True))
    obs = {"xyz": jnp.zeros((2, 3, 64)), "rgb": jnp.zeros((2, 3, 64), jnp.uint8)}
    report = model_report(pn, obs)
    assert report["params"] > 1000
    assert report["flops"] is None or report["flops"] > 1e5


def test_graft_entry_dryrun():
    import __graft_entry__ as g

    g.dryrun_multichip(8)  # conftest already pinned the 8-device CPU mesh


def test_enable_compilation_cache(tmp_path, monkeypatch):
    """Persistent-compile-cache setup: dir created + config set; PCRL_JAX_CACHE=0
    disables; restores the prior config afterwards (shared test process)."""
    import jax

    from pointcloud_rl_tpu.utils import enable_compilation_cache

    prior = jax.config.jax_compilation_cache_dir
    prior_min_secs = jax.config.jax_persistent_cache_min_compile_time_secs
    try:
        target = str(tmp_path / "jc")
        assert enable_compilation_cache(target) == target
        assert os.path.isdir(target)
        assert jax.config.jax_compilation_cache_dir == target
        monkeypatch.setenv("PCRL_JAX_CACHE", "0")
        assert enable_compilation_cache() == ""
        assert jax.config.jax_compilation_cache_dir == target  # untouched when disabled
    finally:
        jax.config.update("jax_compilation_cache_dir", prior)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", prior_min_secs)
