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
    # the default robot is the benchmark's own mobile A2 dual arm
    assert env.robot == "a2_dual" and obs["state"].shape == (68,)
    # unprojection sanity: no point below the ground, and the bucket-mask
    # points cluster around the bucket's world position
    xyz = obs["xyz"].T
    assert xyz[:, 2].min() > -0.05
    bucket_mask = obs["seg"][1].astype(bool)
    assert bucket_mask.sum() > 50, "bucket barely visible in the fused cloud"
    center = xyz[bucket_mask].mean(axis=0)
    true_center = env.data.xpos[env._bucket_body]
    assert np.linalg.norm(center[:2] - true_center[:2]) < 0.3, (center, true_center)
    # robot points exist and sit near the robot base (xy)
    robot_mask = obs["seg"][2].astype(bool)
    assert robot_mask.sum() > 10
    base = env.agent.base_link_pos()
    assert np.linalg.norm(xyz[robot_mask].mean(axis=0)[:2] - base[:2]) < 0.8


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
    obs, reward, done, info = env.step(np.zeros(env.action_space.shape, np.float32))
    assert np.isfinite(reward)
    ev = info["eval_info"]
    assert set(ev) == {"ball_in_bucket", "bucket_above_platform", "bucket_standing",
                       "bucket_static", "success"}
    assert not ev["success"]
    # staged-reward decomposition (reference move_bucket.py:253-266)
    for key in ("dist_ee_actor", "dist_pos", "dist_ori", "ees_oppo", "stage_reward"):
        assert key in info, key
    assert info["stage_reward"] <= -18  # far from the bucket at reset
    # tilt folds through abs(dot) into [0, pi/2] like the reference
    # angle_between_vec (utils/geometry.py:43-47): an INVERTED bucket reads 0
    import mujoco

    qp = env._bucket_qpos
    quat_before = env.data.qpos[qp + 3: qp + 7].copy()
    env.data.qpos[qp + 3: qp + 7] = [0.0, 1.0, 0.0, 0.0]  # 180 deg about x
    mujoco.mj_forward(env.model, env.data)
    assert env._bucket_tilt() == pytest.approx(0.0, abs=1e-6)
    env.data.qpos[qp + 3: qp + 7] = quat_before
    mujoco.mj_forward(env.model, env.data)


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
        _, _, done, info = env.step(np.zeros(env.action_space.shape, np.float32))
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


def test_gripper_variant_still_works():
    """The round-2 floating-gripper path stays selectable for old work dirs."""
    from pointcloud_rl_tpu.env.builder import build_env

    env = build_env(dict(type="gym", env_name="MoveBucketMJC_train-v0",
                         obs_mode="state", robot="gripper"))
    try:
        env.reset(level=2)
        assert env.action_space.shape == (6,)
        _, r, _, info = env.step(np.zeros(6, np.float32))
        assert np.isfinite(r) and "dist_reach" in info
    finally:
        env.close()


def test_a2_robot_controllers_and_obs_layout():
    """A2 agent contract (reference agent.py:533-610): 22-dof dual arm,
    YAML-built controller types, reference observation layout sizes, and
    ego-frame base-velocity rotation."""
    import mujoco

    from pointcloud_rl_tpu.env.a2_robot import A2Robot, robot_assets_available
    from pointcloud_rl_tpu.mani.controllers import PositionController, VelocityController

    if not robot_assets_available():
        pytest.skip("A2 assets unavailable")
    rob = A2Robot("a2_dual", control_freq=50.0)
    # base x/y/z-rot + height are velocity joints; fingers are position
    assert isinstance(rob.controllers[0], VelocityController)
    assert isinstance(rob.controllers[11], PositionController)  # right finger 1
    assert len(rob.controllers) == 22 and rob.action_range.shape == (22, 2)
    assert rob.action_range[2, 1] == pytest.approx(3.14)  # base yaw rate

    env_like = None
    from pointcloud_rl_tpu.env.mujoco_manipulation import MoveBucketEnv

    env = MoveBucketEnv(split="val", obs_mode="state", robot="a2_dual")
    try:
        env.seed(0)
        env.reset(level=2)
        rob = env.agent
        assert rob.get_obs(False).shape == (68,)  # 12+12+2+1+19+19+2+1
        assert rob.get_obs(True).shape == (65,)   # ego drops base_pos/orientation
        assert rob.get_ee_coords().shape == (4, 3)
        # ego action: +x command rotates by the base yaw
        rob.set_state({"base_orientation": np.pi / 2, "base_vel": [0, 0]})
        mujoco.mj_forward(env.model, env.data)
        for c in rob.controllers[:2]:
            c.lp_filter.reset()
        act = np.zeros(22)
        act[0] = 0.5
        rob.set_action(rob.scale_action(act), ego_mode=True)
        ctrl_xy = env.data.ctrl[:2]
        assert abs(ctrl_xy[0]) < 1e-6 and ctrl_xy[1] > 0.05, ctrl_xy
        # scale_action maps [-1,1] onto the YAML action ranges
        hi = rob.scale_action(np.ones(22))
        assert hi[0] == pytest.approx(0.5) and hi[2] == pytest.approx(3.14)
        # OSC qpos recovery works on a REAL observation from this env
        from pointcloud_rl_tpu.mani.osc import OperationalSpaceControlInterface

        osc = OperationalSpaceControlInterface("MoveBucket-v0")
        q = osc.get_robot_qpos_from_obs(env.get_obs())
        np.testing.assert_allclose(q[3:], rob._qpos_all()[3:], atol=1e-6)
        np.testing.assert_array_equal(q[:3], 0)  # base dummied like osc.py:175
    finally:
        env.close()


def test_a2_staged_reward_is_learnable_signal():
    """The staged dense reward (reference move_bucket.py:184-299 port) must
    (a) increase monotonically as the grippers approach the bucket surface
    and (b) pay the +2 stage bonus once dist_ee_actor < 0.1 — i.e. form a
    gradient a policy can climb, which round-2 never demonstrated."""
    import mujoco

    from pointcloud_rl_tpu.env.mujoco_manipulation import MoveBucketEnv

    env = MoveBucketEnv(split="val", obs_mode="state", robot="a2_dual")
    try:
        env.seed(0)
        env.reset(level=2)
        m, d = env.model, env.data
        jid = None
        for j in range(m.njnt):
            if m.joint(j).name == "bucket_root":
                jid = j
        qadr = m.jnt_qposadr[jid]
        ee_mid = env.agent.get_ee_coords().mean(0)

        base = d.qpos[qadr:qadr + 3].copy()
        # (a) ground-level XY approach: the gradient the mobile base climbs.
        rewards, dists = [], []
        for frac in (0.0, 0.4, 0.7, 0.9):
            d.qpos[qadr:qadr + 2] = base[:2] + frac * (ee_mid[:2] - base[:2])
            mujoco.mj_forward(m, d)
            r, info = env._dense_reward_a2(np.zeros(22))
            rewards.append(r)
            dists.append(info["dist_ee_actor"])
        assert all(d2 < d1 for d1, d2 in zip(dists, dists[1:])), dists
        assert all(r2 > r1 for r1, r2 in zip(rewards, rewards[1:])), rewards

        # (b) "grasped and lifted to the 0.2 m target height" clears the
        # first two stage gates and beats every approach state.  Grasp
        # contact (dist_ee_actor ~ 0) is posed by making the reward's
        # surface-point provider report the finger tips themselves — the
        # ladder logic, not IK posing, is what's under test.
        init_h = env._init_bucket_height
        d.qpos[qadr:qadr + 2] = base[:2]
        mujoco.mj_forward(m, d)
        d.qpos[qadr + 2] += (init_h + 0.2) - float(d.xipos[env._bucket_body][2])
        mujoco.mj_forward(m, d)
        env._bucket_points_world = lambda: env.agent.get_ee_coords()
        r_lift, info = env._dense_reward_a2(np.zeros(22))
        assert info["dist_ee_actor"] < 0.1, info
        assert abs(info["bucket_height"] - init_h - 0.2) < 0.03, info
        assert info["stage_reward"] >= -16.0, info  # >= 2 gates cleared
        assert r_lift > max(rewards), (r_lift, rewards)
    finally:
        env.close()


def test_bucket_dist_range_curriculum_knob():
    """Carry-curriculum spawn (pn_shift_movebucket_curriculum.py): the
    platform lands inside the configured bucket->target range, and the
    default stays at the reference's 0.8-1.2 m (move_bucket.py:77-113)."""
    from pointcloud_rl_tpu.env.builder import build_env

    env = build_env(dict(type="gym", env_name="MoveBucketMJC_val-v0",
                         obs_mode="state", robot="gripper",
                         bucket_dist_range=[0.6, 0.75]))
    try:
        assert env.bucket_dist_range == (0.6, 0.75)
        for level in (1, 2):
            env.reset(level=level)
            d = float(np.linalg.norm(env._plat_xy))
            assert 0.6 <= d <= 0.75, d
    finally:
        env.close()

    env = build_env(dict(type="gym", env_name="MoveBucketMJC_val-v0",
                         obs_mode="state", robot="gripper"))
    try:
        assert env.bucket_dist_range == (0.8, 1.2)
    finally:
        env.close()
