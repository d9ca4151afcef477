"""PushChair on MuJoCo with procedural swivel chairs: catalog splits,
chair-point library, staged reward (reference push_chair.py:215-283), eval
flags, and segmentation channels."""

import numpy as np
import pytest

from pointcloud_rl_tpu.env.a2_robot import robot_assets_available

pytestmark = pytest.mark.skipif(
    not robot_assets_available(), reason="A2 robot assets unavailable")


@pytest.fixture(scope="module")
def env():
    from pointcloud_rl_tpu.env.chair_task import PushChairEnv

    env = PushChairEnv(split="train", obs_mode="pointcloud",
                       n_points=512, image_hw=(48, 84))
    yield env
    env.close()


def test_catalog_split_counts():
    from pointcloud_rl_tpu.env.chair_task import chair_catalog

    assert len(chair_catalog("train")) == 25 and len(chair_catalog("val")) == 4
    assert chair_catalog("train") == chair_catalog("train")


def test_obs_and_segmentation(env):
    obs = env.reset(level=2)
    assert obs["xyz"].shape == (3, 512) and obs["seg"].shape == (3, 512)
    assert obs["state"].shape == (68,)  # dual-arm A2 non-ego layout
    xyz = obs["xyz"].T
    # seg 0/1 = chair back/seat: their points must sit near the chair root
    chair_p = env.data.xpos[env._chair_body]
    for ch in (0, 1):
        mask = obs["seg"][ch].astype(bool)
        assert mask.sum() > 5, f"seg channel {ch} empty"
        d = np.linalg.norm(xyz[mask][:, :2] - chair_p[:2], axis=-1)
        assert np.median(d) < 0.7, (ch, np.median(d))
    # seg 2 = target indicator disk at the origin
    tmask = obs["seg"][2].astype(bool)
    assert tmask.sum() > 3
    assert np.linalg.norm(xyz[tmask][:, :2].mean(0)) < 0.25


def test_chair_point_library_rides_the_chair(env):
    import mujoco

    env.reset(level=4)
    pts = env._chair_points_world()
    assert len(pts) > 100
    root = env.data.xpos[env._chair_body]
    assert np.linalg.norm(pts.mean(0)[:2] - root[:2]) < 0.5
    # teleport the chair +0.5 x: the library must follow rigidly
    qp = env._chair_qpos
    env.data.qpos[qp] += 0.5
    mujoco.mj_forward(env.model, env.data)
    pts2 = env._chair_points_world()
    shift = (pts2 - pts).mean(0)
    assert shift[0] == pytest.approx(0.5, abs=1e-6)


def test_eval_flags_and_reward_decomposition(env):
    env.reset(level=5)
    obs, reward, done, info = env.step(np.zeros(env.action_space.shape, np.float32))
    assert np.isfinite(reward) and not done
    ev = info["eval_info"]
    assert set(ev) == {"chair_close_to_target", "chair_standing",
                       "chair_static", "success"}
    assert ev["chair_standing"] is False  # hysteresis: first good step only
    for key in ("dist_ee_actor", "dist_pos", "dist_ori", "actor_vel_norm",
                "stage_reward", "action_norm"):
        assert key in info, key
    # robot spawns 0.8-1.2 m from the chair: approach stage not yet cleared
    assert info["stage_reward"] == pytest.approx(-20.0)


def test_staged_reward_ladder(env):
    """push_chair.py:252-276: approach -> at-target velocity shaping ->
    stillness bonuses, with the tilt gate cutting -5."""
    import mujoco

    env.reset(level=1)
    qp = env._chair_qpos

    def rew(dist_xy, tilt=0.0, ee_on_chair=False):
        env.data.qpos[qp:qp + 2] = env.target_xy + [dist_xy, 0.0]
        quat = np.array([np.cos(tilt / 2), 0.0, np.sin(tilt / 2), 0.0])
        env.data.qpos[qp + 3:qp + 7] = quat
        env.data.qvel[:] = 0
        mujoco.mj_forward(env.model, env.data)
        if ee_on_chair:
            env._saved = env._chair_pts
            ee = env.agent.get_ee_coords()
            env._chair_points_world = lambda: ee
        r, info = env._dense_reward(np.zeros(env.action_space.shape))
        if ee_on_chair:
            del env._chair_points_world  # restore the class method
        return r, info

    # tilt beyond 0.2*pi costs the -5 stage penalty
    _, i_tilt = rew(0.8, tilt=0.3 * np.pi)
    _, i_up = rew(0.8, tilt=0.0)
    assert i_tilt["stage_reward"] == pytest.approx(-30.0)
    assert i_up["stage_reward"] == pytest.approx(-20.0)

    # ee on the chair clears the approach stage
    _, i_touch = rew(0.8, ee_on_chair=True)
    assert i_touch["dist_ee_actor"] < 0.1
    assert i_touch["stage_reward"] == pytest.approx(-16.0)

    # at the target and still: both remaining stages pay out
    r_goal, i_goal = rew(0.05, ee_on_chair=True)
    assert i_goal["stage_reward"] == pytest.approx(-8.0)
    assert r_goal > i_touch["stage_reward"]


def test_success_hysteresis_at_target(env):
    env.reset(level=7)
    qp = env._chair_qpos
    seen = []
    for _ in range(env.keep_good_steps_threshold + 3):
        env.data.qpos[qp:qp + 2] = env.target_xy
        env.data.qpos[qp + 3:qp + 7] = [1, 0, 0, 0]
        env.data.qvel[:] = 0
        import mujoco

        mujoco.mj_forward(env.model, env.data)
        _, _, done, info = env.step(np.zeros(env.action_space.shape, np.float32))
        seen.append(info["eval_info"]["success"])
        if done:
            break
    assert not seen[0] and seen[-1], seen


def test_state_obs_mode_extras():
    from pointcloud_rl_tpu.env.builder import build_env

    env = build_env(dict(type="gym", env_name="PushChairMJC_val-v0",
                         obs_mode="state", image_hw=(48, 84)))
    try:
        s = env.reset(level=1)
        # agent(68) + chair pose(7) + flags(3)  (get_visual_state analog)
        assert s.shape == (78,) and np.isfinite(s).all()
        assert len(env.catalog) == 4
    finally:
        env.close()


def test_robot_init_range_curriculum():
    """robot_init_range shrinks the robot spawn distance (reach-curriculum
    knob; reference default 0.8-1.2 m per push_chair.py:120-142 kept)."""
    from pointcloud_rl_tpu.env.chair_task import PushChairEnv

    near = PushChairEnv(split="train", obs_mode="state",
                        robot_init_range=(0.55, 0.65), image_hw=(32, 56))
    try:
        dists = []
        for lvl in range(4):
            near.reset(level=lvl)
            d = np.linalg.norm(near.agent.base_link_pos()[:2]
                               - near.data.xpos[near._chair_body][:2])
            dists.append(float(d))
        # base->chair root distance stays near the spawn radius (the range
        # is collision-free: nearer spawns intersect the caster star and
        # launch the chair during settling — see chair_task.reset)
        assert max(dists) < 0.8, dists
    finally:
        near.close()
