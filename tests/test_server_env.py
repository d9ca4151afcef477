"""Server-style vec env: batched on-device observation fusion.

TPU-native analogue of the reference ``ServerBasedVectorEnv``
(reference pyrl/env/vec_env.py:562-742); see env/server_env.py.
"""

import numpy as np
import pytest

from pointcloud_rl_tpu.env import build_vec_env


def _dmc_available():
    try:
        from dm_control import suite  # noqa: F401

        return True
    except Exception:
        return False


requires_dmc = pytest.mark.skipif(not _dmc_available(), reason="dm_control unavailable")


def test_obs_fuse_unprojection_matches_numpy():
    """Device unprojection matches the host formula (env/dmc.py:_unproject)."""
    import jax

    from pointcloud_rl_tpu.ops.obs_fuse import dmc_raw_to_pointcloud

    rs = np.random.RandomState(0)
    H = W = 16
    depth = rs.uniform(0.5, 2.0, size=(1, 1, H, W)).astype(np.float32)
    rgb = rs.randint(0, 255, size=(1, 3, H, W)).astype(np.uint8)
    rot, _ = np.linalg.qr(rs.randn(3, 3))
    rot = rot.astype(np.float32)
    cam_z = 1.25
    cam = np.zeros((1, 1, 1, 12), np.float32)
    cam[0, 0, 0, :9] = rot.reshape(-1)
    cam[0, 0, 0, 9] = cam_z
    k = np.array([[20.0, 0, 7.5], [0, 20.0, 7.5], [0, 0, 1.0]])
    inv_k = np.linalg.inv(k).astype(np.float32)

    n_points, num_ground = 64, 16
    out = dmc_raw_to_pointcloud(
        jax.random.PRNGKey(0), depth, rgb, cam, inv_k,
        n_points=n_points, num_ground=num_ground, ground_eps=8e-3,
        max_depth=5.0, z_to_world=True,
    )
    xyz = np.asarray(out["xyz"])[0].T  # [P, 3]
    col = np.asarray(out["rgb"])[0].T
    assert xyz.shape == (n_points, 3) and col.dtype == np.uint8

    # host-side reference cloud from the same raw products
    v, u = np.indices((H, W))
    uv1 = np.stack([u + 0.5, v + 0.5, np.ones((H, W))], axis=-1)
    ref = (uv1 @ inv_k.T * depth[0, 0][..., None]) @ rot.T
    ref[..., 2] += cam_z
    ref = ref.reshape(-1, 3)
    ref_rgb = rgb[0].transpose(1, 2, 0).reshape(-1, 3)

    # every fused point must be an actual unprojected pixel with its color
    d2 = np.linalg.norm(xyz[:, None, :] - ref[None, :, :], axis=-1)
    nearest = d2.argmin(axis=1)
    assert d2.min(axis=1).max() < 1e-4
    np.testing.assert_array_equal(col, ref_rgb[nearest])

    # ground/body split: the last num_ground points sit in the base-z band
    base_z = ref[:, 2].min()
    assert np.all(xyz[n_points - num_ground:, 2] <= base_z + 8e-3 + 1e-5)
    assert np.all(xyz[: n_points - num_ground, 2] > base_z + 8e-3 - 1e-5)


def test_obs_fuse_empty_sides_zero_filled():
    """No valid pixels -> all-zero obs; no body pixels -> zero body block
    (env/dmc.py zero-fill contract)."""
    import jax

    from pointcloud_rl_tpu.ops.obs_fuse import dmc_raw_to_pointcloud

    H = W = 8
    inv_k = np.eye(3, dtype=np.float32)
    cam = np.zeros((1, 1, 1, 12), np.float32)
    cam[0, 0, 0, :9] = np.eye(3, dtype=np.float32).reshape(-1)
    rgb = np.full((1, 3, H, W), 200, np.uint8)

    # everything beyond max_depth -> fully zero
    depth = np.full((1, 1, H, W), 9.0, np.float32)
    out = dmc_raw_to_pointcloud(
        jax.random.PRNGKey(0), depth, rgb, cam, inv_k,
        n_points=32, num_ground=8, ground_eps=1e-2, max_depth=5.0, z_to_world=False,
    )
    assert np.all(np.asarray(out["xyz"]) == 0) and np.all(np.asarray(out["rgb"]) == 0)

    # flat plane: every valid pixel is ground -> body block zero-filled
    depth = np.full((1, 1, H, W), 1.0, np.float32)
    cam2 = cam.copy()
    cam2[0, 0, 0, :9] = np.diag([1.0, 1.0, 0.0]).astype(np.float32).reshape(-1)  # flatten z
    out = dmc_raw_to_pointcloud(
        jax.random.PRNGKey(0), depth, rgb, cam2, inv_k,
        n_points=32, num_ground=8, ground_eps=1e-2, max_depth=5.0, z_to_world=False,
    )
    xyz = np.asarray(out["xyz"])[0].T
    col = np.asarray(out["rgb"])[0].T
    assert np.all(xyz[:24] == 0) and np.all(col[:24] == 0)  # body side empty
    assert np.all(col[24:] == 200)  # ground points carry their color


@requires_dmc
@pytest.mark.slow
def test_server_vec_env_contract():
    """server_obs=True yields the same observation contract as the host
    pipeline, via raw-mode workers + one batched device fusion."""
    cfg = dict(
        type="gym", env_name="dmc_cartpole_swingup-v0", obs_mode="pointcloud",
        stack_frame=3, server_obs=True, image_size=(64, 64), n_points=128,
        num_ground=32,
    )
    host_cfg = {k: v for k, v in cfg.items() if k != "server_obs"}
    env = build_vec_env(cfg, num_procs=2, base_seed=0)
    host = build_vec_env(host_cfg, num_procs=1, base_seed=0)
    try:
        obs = env.reset()
        ref = host.reset()
        assert obs["xyz"].shape == (2, 3, 128 * 3)
        assert obs["rgb"].shape == (2, 3, 128 * 3) and obs["rgb"].dtype == np.uint8
        assert obs["pos_encoding"].shape == (2, 3, 128 * 3)
        assert set(obs.keys()) == set(ref.keys())
        assert obs["xyz"].dtype == ref["xyz"].dtype
        # same scene scale as the host pipeline (not an exact-sample match:
        # downsampling is stochastic)
        assert abs(float(np.abs(obs["xyz"]).max()) - float(np.abs(ref["xyz"]).max())) < 1.0
        actions = np.stack([env.single_action_space.sample() for _ in range(2)])
        obs2, r, d, infos = env.step(actions)
        assert obs2["xyz"].shape == (2, 3, 128 * 3)
        assert r.shape == (2, 1) and d.shape == (2, 1)
    finally:
        env.close()
        host.close()


def test_server_vec_env_unified_step_dict_writable_buffer():
    """Regression: the unified API's persistent recent_obs buffer must be
    WRITABLE even though server fusion returns read-only zero-copy host
    views of device arrays — step_dict_wait writes next_obs into it in
    place (vec_env.py step_dict_wait)."""
    cfg = dict(
        type="gym", env_name="dmc_cartpole_swingup-v0", obs_mode="pointcloud",
        stack_frame=3, server_obs=True, image_size=(64, 64), n_points=128,
        num_ground=32,
    )
    env = build_vec_env(cfg, num_procs=2, base_seed=0)
    try:
        env.reset()
        actions = np.stack([env.single_action_space.sample() for _ in range(2)])
        ret = env.step_dict(actions)
        assert ret["obs"]["xyz"].shape == (2, 3, 128 * 3)
        ret2 = env.step_dict(actions)  # second write into the same buffer
        assert np.isfinite(ret2["rewards"]).all()
    finally:
        env.close()
