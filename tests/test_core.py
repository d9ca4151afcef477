"""Unit tests for registry, config system, and host tree ops."""

import os

import numpy as np
import pytest

from pointcloud_rl_tpu import Config, DictAction, Registry, build_from_cfg
from pointcloud_rl_tpu.utils import (
    EpisodicStatistics,
    EveryNSteps,
    RunningMeanStd,
    batch_size,
    f64_to_f32,
    split_num,
    tree_assign,
    tree_concat,
    tree_empty_like_with_capacity,
    tree_key_get,
    tree_map,
    tree_slice,
    tree_stack,
    tree_take,
)


# ---------------------------------------------------------------- registry
def test_registry_register_and_build():
    REG = Registry("test")

    @REG.register_module()
    class Foo:
        def __init__(self, a, b=2):
            self.a, self.b = a, b

    obj = build_from_cfg(dict(type="Foo", a=1), REG)
    assert isinstance(obj, Foo) and obj.a == 1 and obj.b == 2
    obj = build_from_cfg(dict(type="Foo", a=1, b=5), REG, default_args=dict(b=9))
    assert obj.b == 5
    assert build_from_cfg(None, REG) is None
    with pytest.raises(KeyError):
        build_from_cfg(dict(type="Bar"), REG)
    with pytest.raises(KeyError):
        REG.register_module(module=Foo)  # duplicate


# ---------------------------------------------------------------- config
def test_config_fromfile_base_inheritance(tmp_path):
    base = tmp_path / "base.py"
    base.write_text("a = 1\nnet = dict(type='MLP', width=64, depth=2)\n")
    child = tmp_path / "child.py"
    child.write_text("_base_ = ['base.py']\nnet = dict(width=128)\nb = 'x'\n")
    cfg = Config.fromfile(str(child))
    assert cfg.a == 1 and cfg.b == "x"
    assert cfg.net.type == "MLP" and cfg.net.width == 128 and cfg.net.depth == 2


def test_config_delete_key(tmp_path):
    base = tmp_path / "base.py"
    base.write_text("net = dict(type='MLP', width=64)\n")
    child = tmp_path / "child.py"
    child.write_text("_base_ = ['base.py']\nnet = dict(_delete_=True, type='CNN')\n")
    cfg = Config.fromfile(str(child))
    assert cfg.net.to_dict() if hasattr(cfg.net, "to_dict") else dict(cfg.net) == dict(type="CNN")


def test_config_merge_from_dict():
    cfg = Config({"agent": {"lr": 1e-3, "net": {"width": 64}}, "steps": 100})
    cfg.merge_from_dict({"agent.lr": 3e-4, "agent.net.width": 128, "steps": 5})
    assert cfg.agent.lr == 3e-4 and cfg.agent.net.width == 128 and cfg.steps == 5


def test_config_dump_roundtrip(tmp_path):
    cfg = Config({"a": 1, "b": {"c": [1, 2], "d": "s"}, "e": (3, 4), "f": None})
    out = tmp_path / "dump.py"
    cfg.dump(str(out))
    cfg2 = Config.fromfile(str(out))
    assert cfg2.a == 1 and cfg2.b.c == [1, 2] and cfg2.b.d == "s" and cfg2.f is None


def test_dict_action_parsing():
    import argparse

    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg-options", nargs="+", action=DictAction)
    args = parser.parse_args(
        ["--cfg-options", "a.b=3", "c=true", "d=none", "e=[1,2]", "f=(1.5,2)", "g=text"]
    )
    assert args.cfg_options == {"a.b": 3, "c": True, "d": None, "e": [1, 2], "f": (1.5, 2), "g": "text"}


# ---------------------------------------------------------------- tree ops
def test_tree_ops_roundtrip():
    tree = {"obs": {"xyz": np.zeros((4, 3, 8)), "rgb": np.ones((4, 3, 8), np.uint8)}, "r": np.arange(4.0)}
    assert batch_size(tree) == 4
    sl = tree_slice(tree, slice(1, 3))
    assert batch_size(sl) == 2
    tk = tree_take(tree, np.array([0, 2]))
    assert tk["r"].tolist() == [0.0, 2.0]
    cat = tree_concat([sl, tk])
    assert batch_size(cat) == 4
    st = tree_stack([tk, tk], axis=0)
    assert st["r"].shape == (2, 2)
    assert tree_key_get(tree, "obs/xyz").shape == (4, 3, 8)


def test_tree_assign_and_capacity():
    src = {"a": np.ones((2, 3), np.float32)}
    buf = tree_empty_like_with_capacity(src, capacity=10)
    assert buf["a"].shape == (10, 3)
    tree_assign(buf, slice(4, 6), src)
    assert buf["a"][4:6].sum() == 6.0


def test_f64_to_f32():
    out = f64_to_f32({"a": np.zeros(3, np.float64), "b": np.zeros(3, np.int64), "c": np.zeros(3, np.uint8)})
    assert out["a"].dtype == np.float32 and out["b"].dtype == np.int32 and out["c"].dtype == np.uint8


# ---------------------------------------------------------------- stats
def test_every_n_steps():
    trig = EveryNSteps(10)
    fired = [s for s in range(1, 35) if trig.check(s)]
    assert fired == [10, 20, 30]
    assert not EveryNSteps(-1).check(100)
    assert not EveryNSteps(None).check(100)


def test_running_mean_std():
    rms = RunningMeanStd(shape=(3,))
    data = np.random.RandomState(1).randn(1000, 3) * 2 + 5
    for chunk in np.split(data, 10):
        rms.update(chunk)
    np.testing.assert_allclose(rms.mean, data.mean(0), atol=1e-6)
    np.testing.assert_allclose(rms.std, data.std(0), atol=1e-3)


def test_episodic_statistics():
    es = EpisodicStatistics(2)
    es.push(np.array([1.0, 2.0]), np.array([False, False]))
    n = es.push(np.array([1.0, 2.0]), np.array([True, False]))
    assert n == 1
    es.push(np.array([0.0, 2.0]), np.array([False, True]))
    stats = es.get_stats()
    assert stats["env/num_episodes"] == 2
    assert stats["env/rewards_max"] == 6.0
    assert stats["env/rewards_min"] == 2.0


def test_episodic_statistics_carry_forward_synchronized_episodes():
    """Synchronized fixed-length episodes (walker: 1000 steps, all workers
    reset together) complete only every episode_len * num_workers global
    steps; with n_log=1000 most log windows contain NO completion.  Those
    windows must carry the last completed-window stats forward (marked
    stale via num_episodes=0) instead of logging 0.0 (round-4 weak #4:
    metrics.csv read env/rewards_mean 0.0 for ~90% of rows)."""
    num_workers, ep_len, n_log = 4, 1000, 1000
    es = EpisodicStatistics(num_workers)
    logged = []
    # 3 episodes' worth of synchronized stepping, logging every n_log
    # GLOBAL steps (num_workers env steps per push)
    for step in range(3 * ep_len):
        done = (step + 1) % ep_len == 0
        es.push(np.full(num_workers, 0.5), np.full(num_workers, done))
        if ((step + 1) * num_workers) % n_log == 0:
            logged.append(es.get_stats())
            es.reset_history()
    assert len(logged) == 12
    fresh = [s for s in logged if s["env/num_episodes"] > 0]
    stale = [s for s in logged if s["env/num_episodes"] == 0]
    assert len(fresh) == 3  # one real completion window per episode
    # the first windows precede any completion: zeros are correct there
    lead_in = [s for s in stale if s["env/rewards_mean"] == 0.0]
    assert len(lead_in) == 3  # only the pre-first-episode windows
    # every window after the first completion carries the true value
    first_fresh = logged.index(fresh[0])
    for s in logged[first_fresh:]:
        assert s["env/rewards_mean"] == 0.5 * ep_len
        assert s["env/episode_length"] == ep_len


def test_split_num():
    assert split_num(10, 3) == [4, 3, 3]
    assert sum(split_num(17, 5)) == 17


def test_episodic_statistics_info_keys():
    """Configurable info-key reductions (reference train_rl.py:16-24,44-56):
    max-reduced success flags and mean-reduced distances reach get_stats."""
    es = EpisodicStatistics(2, info_keys_mode={
        "success": [True, "max", "all"],
        "dist": [True, "mean", "mean"],
    })
    es.push(np.array([1.0, 2.0]), np.array([False, False]),
            infos={"success": np.array([[0], [0]]), "dist": np.array([[2.0], [4.0]])})
    es.push(np.array([1.0, 2.0]), np.array([True, True]),
            infos={"success": np.array([[1], [0]]), "dist": np.array([[4.0], [6.0]])})
    stats = es.get_stats()
    assert stats["env/success_mean"] == 0.5
    assert stats["env/success_min"] == 0.0 and stats["env/success_max"] == 1.0
    assert stats["env/dist_mean"] == 4.0  # per-episode means 3.0 and 5.0
    assert "env/dist_min" not in stats  # log_mode "mean" suppresses min/max
    # push_single path (pipelined rollout) with row indexing
    es.reset_history()
    es.push_single(0, 1.0, False, infos={"success": np.array([[0], [1]])}, row=0)
    es.push_single(0, 1.0, True, infos={"success": np.array([[1], [0]])}, row=0)
    assert es.get_stats()["env/success_mean"] == 1.0
