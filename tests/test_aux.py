"""Aux subsystems: SoftplusGaussian head, eval trajectory dump, key remap,
memory telemetry, minibatch runner."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointcloud_rl_tpu.models import build_all


def test_softplus_gaussian_head():
    head = build_all(dict(type="SoftplusGaussianHead", dim_output=3, bound=[-np.ones(3), np.ones(3)]))
    feat = jnp.zeros((4, 6))
    params = head.init({"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}, feat)
    a, neg_logp = head.apply(params, feat, mode="max-entropy", rngs={"sample": jax.random.PRNGKey(2)})
    assert a.shape == (4, 3) and neg_logp.shape == (4, 1)
    assert "log_var_min" in params["params"] and "log_var_max" in params["params"]
    mean = head.apply(params, feat, mode="eval")
    np.testing.assert_allclose(np.asarray(mean), 0, atol=1e-6)


def test_eval_trajectory_dump(tmp_path):
    import h5py

    from pointcloud_rl_tpu.env import Evaluation

    ev = Evaluation(
        env_cfg=dict(type="gym", env_name="FakeManipulation-v0", obs_mode="pointcloud",
                     n_points=32, n_raw_points=200, horizon=4),
        num_procs=1, num=2, save_traj=True, seed=0,
    )
    try:
        pi = lambda obs, mode="eval": np.zeros((1, 8), np.float32)
        ev.run(pi, num=2, work_dir=str(tmp_path))
        with h5py.File(str(tmp_path / "trajectory.h5")) as f:
            assert "traj_0" in f and "traj_1" in f
            assert f["traj_0"]["actions"].shape == (4, 8)
            assert f["traj_0"]["obs"]["xyz"].shape == (4, 3, 32)
            assert "env_states" in f["traj_0"]
    finally:
        ev.close()


def test_checkpoint_key_remap():
    from pointcloud_rl_tpu.utils.checkpoint import remap_keys

    tree = {"visual": {"w": 1}, "actor": {"w": 2}}
    out = remap_keys(tree, {"^visual$": "critic_visual"})
    assert set(out) == {"critic_visual", "actor"}
    assert out["critic_visual"]["w"] == 1


def test_memory_telemetry():
    from pointcloud_rl_tpu.utils.process import get_total_memory_mb

    mb = get_total_memory_mb()
    assert mb > 10  # this process alone is bigger than 10 MB


def test_run_with_mini_batch():
    from pointcloud_rl_tpu.algorithms.base import run_with_mini_batch

    calls = []

    @jax.jit
    def fn(batch):
        return {"y": batch["x"] * 2}

    def wrapped(batch):
        calls.append(batch["x"].shape)
        return fn(batch)

    data = {"x": np.arange(10, dtype=np.float32)}
    out = run_with_mini_batch(wrapped, data, batch_size=4)
    np.testing.assert_array_equal(out["y"], np.arange(10) * 2)
    assert all(s == (4,) for s in calls)  # tail padded, single compile shape


def test_stall_watchdog_fires_and_marks(tmp_path):
    """Injected hang: no pets past the timeout -> on_stall callback runs
    (host-only marker) and the process-exit hook is invoked with the
    configured code (utils/watchdog.py)."""
    import time

    from pointcloud_rl_tpu.utils.watchdog import StallWatchdog

    exits = []
    marker = tmp_path / "STALLED"

    def on_stall():
        marker.write_text("wedged")

    wd = StallWatchdog(timeout_s=0.4, poll_s=0.1, on_stall=on_stall,
                       exit_code=3, _exit=lambda code: exits.append(code))
    try:
        # petting keeps it alive
        for _ in range(4):
            wd.pet()
            time.sleep(0.15)
        assert not wd.fired and not exits
        # paused sections (long first compiles) never fire
        wd.pause()
        time.sleep(0.6)
        assert not wd.fired
        wd.resume()
        # now hang: no pets
        deadline = time.monotonic() + 5
        while not exits and time.monotonic() < deadline:
            time.sleep(0.05)
        assert exits == [3]
        assert wd.fired
        assert marker.read_text() == "wedged"
    finally:
        wd.stop()


def test_feature_analysis_visualization(tmp_path):
    """kmeans / feature_similarity / tsne_scatter (reference
    visualization/cluster.py:5, feat_sim.py:18, t-SNE cluster plots)."""
    import numpy as np

    from pointcloud_rl_tpu.utils.visualization import (feature_similarity, kmeans,
                                                       tsne_scatter)

    rng = np.random.RandomState(0)
    # two well-separated blobs
    x = np.concatenate([rng.randn(30, 8), rng.randn(30, 8) + 8.0])
    center, pred, err = kmeans(x, n_clusters=2, seed=0)
    assert center.shape == (2, 8) and pred.shape == (60,)
    assert len(set(pred[:30])) == 1 and len(set(pred[30:])) == 1  # blobs separate
    # assignment mode reuses given centers
    _, pred2, _ = kmeans(x, center=center)
    assert (pred2 == pred).all()

    # identical feature spaces have IoU 1; unrelated ones lower
    sim_same = feature_similarity(x, x.copy(), k=8)
    assert np.allclose(sim_same, 1.0)
    sim_rand = feature_similarity(x, rng.randn(60, 8), k=8)
    assert sim_rand.mean() < 0.9

    out = tmp_path / "tsne.png"
    emb = tsne_scatter(x, labels=pred, save_path=str(out), seed=0)
    assert emb.shape == (60, 2) and out.exists()


def test_pointcloud_html_viewer(tmp_path):
    """Interactive HTML viewer (o3d interactive-viewer role, dependency-free):
    embeds the points + colors, handles channel-first input, subsamples."""
    import numpy as np

    from pointcloud_rl_tpu.utils.visualization import pointcloud_html

    xyz = np.random.RandomState(0).randn(300, 3).astype(np.float32)
    rgb = np.random.RandomState(1).randint(0, 255, (300, 3)).astype(np.uint8)
    p = pointcloud_html(xyz, rgb, str(tmp_path / "v.html"))
    s = open(p).read()
    assert "orbit" in s and "__PTS__" not in s and "null" not in s.split("COL=")[1][:8]
    # channel-first [3, N] input and max_points subsampling
    p2 = pointcloud_html(xyz.T, rgb.T, str(tmp_path / "v2.html"), max_points=100)
    s2 = open(p2).read()
    assert s2.count("[") < s.count("[")  # 100-point subsample embeds fewer rows
