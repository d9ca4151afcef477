"""Real-physics MoveBucket on MuJoCo + PartNet-Mobility assets: scene
composition, camera fusion geometry, segmentation masks, eval-flag protocol,
and level-seeded variant sampling."""

import numpy as np
import pytest

from pointcloud_rl_tpu.env.mujoco_manipulation import assets_available

pytestmark = pytest.mark.skipif(not assets_available(), reason="PartNet-Mobility assets unavailable")


@pytest.fixture(scope="module")
def env():
    from pointcloud_rl_tpu.env.builder import build_env

    env = build_env(dict(type="gym", env_name="MoveBucketMJC_train-v0", obs_mode="pointcloud"))
    yield env
    env.close()


def test_obs_contract_and_geometry(env):
    obs = env.reset(level=3)
    assert obs["xyz"].shape == (3, env.n_points) and obs["xyz"].dtype == np.float32
    assert obs["rgb"].dtype == np.uint8 and obs["seg"].shape[0] == 3
    # unprojection sanity: no point below the ground, and the bucket-mask
    # points cluster around the bucket's world position
    xyz = obs["xyz"].T
    assert xyz[:, 2].min() > -0.05
    bucket_mask = obs["seg"][1].astype(bool)
    assert bucket_mask.sum() > 50, "bucket barely visible in the fused cloud"
    center = xyz[bucket_mask].mean(axis=0)
    true_center = env.data.xpos[env._bucket_body]
    assert np.linalg.norm(center[:2] - true_center[:2]) < 0.3, (center, true_center)
    # robot (gripper) points exist and sit near the gripper
    robot_mask = obs["seg"][2].astype(bool)
    assert robot_mask.sum() > 10
    grip = env.data.xpos[env._gripper_body]
    assert np.linalg.norm(xyz[robot_mask].mean(axis=0) - grip) < 0.5


def test_level_seeding_samples_split_models(env):
    env.reset(level=0)
    m0 = env.model_id
    env.reset(level=0)
    assert env.model_id == m0, "same level must resample the same model"
    ids = set()
    for l in range(8):
        env.reset(level=l)
        ids.add(env.model_id)
    assert len(ids) > 1, "levels never vary the bucket model"
    assert all(i in env.split_models for i in ids)


def test_step_reward_and_eval_flags(env):
    env.reset(level=5)
    obs, reward, done, info = env.step(np.zeros(6, np.float32))
    assert np.isfinite(reward)
    ev = info["eval_info"]
    assert set(ev) == {"ball_in_bucket", "bucket_above_platform", "bucket_standing",
                       "bucket_static", "success"}
    assert not ev["success"]
    assert "dist_reach" in info and "dist_target" in info


def test_success_when_bucket_placed(env):
    """Teleport the settled bucket over the platform: the platform/standing/
    static flags must latch after keep_good_steps consecutive good steps."""
    import mujoco

    env.reset(level=7)
    qp = env._bucket_qpos
    env.data.qpos[qp:qp + 2] = env._plat_xy
    env.data.qpos[qp + 2] += 0.12  # sit on the platform
    ball = env._ball_qpos
    env.data.qpos[ball:ball + 2] = env._plat_xy
    env.data.qpos[ball + 2] = env.data.qpos[qp + 2] + 0.05
    env.data.qvel[:] = 0
    mujoco.mj_forward(env.model, env.data)
    flags_seen = []
    for _ in range(env.keep_good_steps_threshold + 4):
        _, _, done, info = env.step(np.zeros(6, np.float32))
        flags_seen.append(info["eval_info"])
        if done:
            break
    last = flags_seen[-1]
    assert last["bucket_above_platform"] and last["bucket_standing"], flags_seen[-1]


def test_state_obs_mode():
    from pointcloud_rl_tpu.env.builder import build_env

    env = build_env(dict(type="gym", env_name="MoveBucketMJC_val-v0", obs_mode="state"))
    try:
        s = env.reset(level=1)
        assert s.ndim == 1 and np.isfinite(s).all()
        assert len(env.split_models) == 4  # the benchmark's val split
    finally:
        env.close()
