"""DM Control integration tests (skipped when EGL rendering is unavailable)."""

import numpy as np
import pytest

from pointcloud_rl_tpu.env import build_env, get_env_info

pytestmark = pytest.mark.dmc


def _dmc_available():
    try:
        from dm_control import suite  # noqa: F401

        return True
    except Exception:
        return False


requires_dmc = pytest.mark.skipif(not _dmc_available(), reason="dm_control unavailable")


@requires_dmc
def test_parse_dmc_names():
    from pointcloud_rl_tpu.env.dmc import parse_dmc_name

    assert parse_dmc_name("dmc_cheetah_run-v0") == ("cheetah", "run")
    assert parse_dmc_name("dmc_ball_in_cup_catch-v0") == ("ball_in_cup", "catch")
    assert parse_dmc_name("dmc_walker_walk-v0") == ("walker", "walk")


@requires_dmc
@pytest.mark.slow
def test_dmc_pointcloud_obs():
    cfg = dict(type="gym", env_name="dmc_cartpole_swingup-v0", obs_mode="pointcloud", stack_frame=3)
    env = build_env(cfg)
    try:
        env.seed(0)
        obs = env.reset()
        # cartpole: 256 body pts * 4/3 = 341 points per frame, 3 stacked frames
        n = obs["xyz"].shape[-1]
        assert obs["xyz"].shape == (3, n) and n == 341 * 3
        assert obs["rgb"].dtype == np.uint8
        assert obs["pos_encoding"].shape == (3, n)
        assert obs["xyz"].dtype == np.float32
        # points lie within the depth filter distance
        assert np.abs(obs["xyz"]).max() < 20
        a = env.action_space.sample()
        obs2, r, done, info = env.step(a)
        assert np.isfinite(r) and not done
        info_d = get_env_info(cfg, env=None)
        assert info_d["obs_shape"]["xyz"] == (3, n)
        # ground/body split: exactly num_ground points at min height band
        from pointcloud_rl_tpu.env.dmc import DEFAULT_NUM_BODY

        assert info_d["action_shape"] == 1
    finally:
        env.close()


@requires_dmc
@pytest.mark.slow
def test_dmc_rgbd_obs():
    cfg = dict(type="gym", env_name="dmc_cartpole_swingup-v0", obs_mode="rgbd", image_size=(64, 64), stack_frame=2)
    env = build_env(cfg)
    try:
        env.seed(0)
        obs = env.reset()
        assert obs["rgb"].shape == (6, 64, 64) and obs["rgb"].dtype == np.uint8
        assert obs["depth"].shape == (2, 64, 64)
        assert 0 <= obs["depth"].min() and obs["depth"].max() <= 1.0
    finally:
        env.close()


@requires_dmc
@pytest.mark.slow
def test_dmc_dense_cloud_filter_seg():
    """num_ground=-1: dense permuted cloud + foreground mask channel (the
    pn_sample.py env contract; consumed by RandomDownSampleAndFilter)."""
    cfg = dict(type="gym", env_name="dmc_cartpole_swingup-v0", obs_mode="pointcloud",
               stack_frame=3, num_ground=-1, n_points=500)
    env = build_env(cfg)
    try:
        env.seed(0)
        obs = env.reset()
        n = obs["xyz"].shape[-1]
        assert n == 500 * 3
        assert obs["filter_seg"].shape == (1, n) and obs["filter_seg"].dtype == np.uint8
        seg = obs["filter_seg"][0].astype(bool)
        # both classes present and the mask matches the height heuristic:
        # foreground points sit strictly above the lowest band
        assert seg.any() and (~seg).any()
        z = obs["xyz"][2]
        assert z[seg].min() >= z[~seg].min()
        info_d = get_env_info(cfg, env=None)
        assert info_d["obs_shape"]["filter_seg"] == (1, n)
    finally:
        env.close()
