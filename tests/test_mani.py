"""ManiSkill framework pieces that run without SAPIEN: controllers, YAML
config pipeline, geometry helpers, eval harness, and the fake env's extended
observation contract (camera fusion, ego mode, eval hysteresis)."""

import os

import numpy as np
import pytest

from pointcloud_rl_tpu.mani import (
    Evaluator,
    BasePolicy,
    LPFilter,
    PIDController,
    PositionController,
    Pose,
    VelocityController,
    angle_distance,
    apply_pose_to_points,
    axangle2quat,
    build_joint_controllers,
    euler2quat,
    load_task_config,
    normalize_and_clip_in_interval,
    process_variables,
    process_variants,
    qmult,
    rew_close_to_target,
)

REF_YAML = "/root/reference/mani_skill/mani_skill/assets/config_files/open_cabinet_door.yml"


# ------------------------------------------------------------- controllers
def test_lp_filter_attenuates_high_frequencies():
    t = np.linspace(0, 1, 400, endpoint=False)
    hi = np.sin(2 * np.pi * 80 * t)
    f = LPFilter(control_freq=400, cutoff_freq=5)
    out = np.array([f.next(x) for x in hi])
    # 80 Hz through a 5 Hz low-pass: heavily attenuated in steady state
    assert np.abs(out[200:]).max() < 0.25 * np.abs(hi).max()
    # and a DC signal passes through
    f2 = LPFilter(400, 5)
    for _ in range(400):
        y = f2.next(1.0)
    assert abs(y - 1.0) < 1e-3


def test_pid_controller_clips_and_converges():
    pid = PIDController(kp=5.0, ki=0.2, kd=0.0, control_freq=100, output_range=[-1, 1])
    # big error -> clipped to range
    assert pid.control(0.0, 100.0) == 1.0
    pid.reset()
    # simulate a simple integrator plant: qpos += v * dt
    q = 0.0
    for _ in range(300):
        v = pid.control(q, 1.0)
        q += v * 0.01
    assert abs(q - 1.0) < 0.05


def test_position_controller_first_step_has_no_derivative_kick():
    pid = PIDController(kp=1.0, ki=0.0, kd=10.0, control_freq=100, output_range=[-100, 100])
    pc = PositionController(pid)
    # first call: prev_err is initialized to err, so D term contributes 0
    assert pc.control(0.0, 0.5) == pytest.approx(0.5)


def test_build_joint_controllers_from_yaml_spec():
    joints = [
        dict(action_type="velocity", action_range=[-1, 1],
             velocity_filter=dict(cutoff_frequency=10)),
        dict(action_type="position", action_range=[-2, 2],
             velocity_pid=dict(kp=1, ki=0, kd=0, limit=[-3, 3])),
    ]
    ctrls, rng = build_joint_controllers(joints, control_freq=100)
    assert isinstance(ctrls[0], VelocityController) and ctrls[0].lp_filter is not None
    assert isinstance(ctrls[1], PositionController)
    np.testing.assert_array_equal(rng, [[-1, 1], [-2, 2]])


# ------------------------------------------------------------ config parser
def test_config_parser_include_override_variables_variants(tmp_path):
    (tmp_path / "base.yml").write_text("fovy: 1.0\nwidth: 40\nheight: 16\n")
    (tmp_path / "task.yml").write_text(
        "render:\n"
        "  _include: base.yml\n"
        "  _override:\n"
        "    width: 64\n"
        "physics:\n"
        "  $g: eval(9.81)\n"
        "  gravity: [0, 0, eval(-$g)]\n"
        "  timestep: eval(1/500)\n"
        "  noise: Uniform(0.0, 0.0)\n"
        "layout:\n"
        "  articulations:\n"
        "    - name: cabinet\n"
        "      urdf_file: base.yml\n"
        "      _variants:\n"
        "        type: options\n"
        "        global_id: partnet_mobility_id\n"
        "        options:\n"
        "          '4000': {scale: 0.5}\n"
        "          '4001': {scale: 0.8}\n"
    )
    cfg = load_task_config(tmp_path / "task.yml")
    assert cfg["render"]["width"] == 64 and cfg["render"]["fovy"] == 1.0
    # file paths resolved relative to the YAML
    assert os.path.isabs(cfg["layout"]["articulations"][0]["urdf_file"])

    rng = np.random.RandomState(0)
    cfg = process_variables(cfg, rng)
    assert cfg["physics"]["gravity"][2] == pytest.approx(-9.81)
    assert cfg["physics"]["timestep"] == pytest.approx(1 / 500)
    assert "$g" not in cfg["physics"]

    # pinned variant
    resolved, chosen = process_variants(cfg, rng, {"partnet_mobility_id": "4001"})
    art = resolved["layout"]["articulations"][0]
    assert art["scale"] == 0.8 and "_variants" not in art
    assert chosen["partnet_mobility_id"]["key"] == "4001"
    assert chosen["partnet_mobility_id"]["index"] == 1


@pytest.mark.skipif(not os.path.exists(REF_YAML), reason="reference assets not present")
def test_config_parser_on_reference_task_yaml():
    """The pipeline digests the REAL OpenCabinetDoor task spec end-to-end."""
    cfg = load_task_config(REF_YAML)
    rng = np.random.RandomState(7)
    cfg = process_variables(cfg, rng)
    resolved, chosen = process_variants(cfg, rng, {})
    # includes spliced: physics knobs + cameras from components
    assert resolved["physics"]["simulation_frequency"] == 500
    cams = resolved["render"]["cameras"]
    assert any(c.get("name") == "world" for c in cams if isinstance(c, dict))
    # the cabinet model variant resolved against the real model list
    assert "partnet_mobility_id" in chosen
    art = resolved["layout"]["articulations"][0]
    assert "partnet_mobility_id" not in art.get("_variants", {})
    assert resolved["agent"]["initial_qpos"][3] == pytest.approx(0.0001)


# --------------------------------------------------------------- geometry
def test_quaternion_roundtrip_and_angle_distance():
    q = euler2quat(0.3, -0.2, 0.7)
    assert np.linalg.norm(q) == pytest.approx(1.0)
    # rotating by q then q^-1 is identity
    p = Pose([1, 2, 3], q)
    ident = p.inv().transform(p)
    np.testing.assert_allclose(ident.p, 0, atol=1e-12)
    assert angle_distance(ident.q, [1, 0, 0, 0]) == pytest.approx(0, abs=1e-6)
    # 90 deg about z = 0.5 normalized angle distance
    q90 = axangle2quat([0, 0, 1], np.pi / 2)
    assert angle_distance([1, 0, 0, 0], q90) == pytest.approx(0.5)
    # negative-w relative rotation exceeds 1.0 (reference geometry.py:62-64
    # arctan2 form, NOT canonicalized): 270 deg about z -> 1.5
    q270 = axangle2quat([0, 0, 1], 3 * np.pi / 2)
    assert angle_distance([1, 0, 0, 0], q270) == pytest.approx(1.5)


def test_quaternion_and_pose_vec_distance():
    from pointcloud_rl_tpu.mani import Pose, pose_vec_distance, quaternion_distance

    q90 = axangle2quat([0, 0, 1], np.pi / 2)
    # contrib.py:175-179: 1 - |w| of the relative quaternion
    assert quaternion_distance([1, 0, 0, 0], q90) == pytest.approx(1 - np.cos(np.pi / 4))
    assert quaternion_distance(q90, q90) == pytest.approx(0.0)
    # contrib.py:189-192: dist_p + 0.01 * quaternion_distance, one float
    d = pose_vec_distance(Pose([0, 0, 0], [1, 0, 0, 0]), Pose([3, 4, 0], q90))
    assert d == pytest.approx(5.0 + 0.01 * (1 - np.cos(np.pi / 4)))


def test_apply_pose_to_points_matches_matrix():
    rs = np.random.RandomState(3)
    pts = rs.randn(50, 3)
    pose = Pose(rs.randn(3), rs.randn(4))
    out = apply_pose_to_points(pts, pose)
    m = pose.to_transformation_matrix()
    expected = pts @ m[:3, :3].T + m[:3, 3]
    np.testing.assert_allclose(out, expected, atol=1e-12)


def test_reward_helpers():
    assert normalize_and_clip_in_interval(0.5, 0, 1) == 0.5
    assert normalize_and_clip_in_interval(5, 0, 1) == 1.0
    # one-arg form is symmetric around zero (reference quirk)
    assert normalize_and_clip_in_interval(0, 2) == 0.5
    r, info = rew_close_to_target(
        pos=[0, 0, 0], vel=[1, 0, 0], target_pos=[1, 0, 0],
        max_dist=2, max_vel=1, dist_coeff=1, vel_coeff=2, angle_coeff=1,
    )
    # dist=1 over [0,2] -> 0.5; vel fully aligned at max -> 2; angle 0 -> 1
    assert r == pytest.approx(0.5 + 2 + 1)
    assert info["rew_vel"] == pytest.approx(2.0)


# ------------------------------------------------- evaluator + fake env
def test_evaluator_counts_eval_info_flags(tmp_path):
    from pointcloud_rl_tpu.env.fake_manipulation import FakeManipulationEnv

    env = FakeManipulationEnv(obs_mode="state", action_dim=8, horizon=8)

    class GreedyPolicy(BasePolicy):
        obs_mode = "state"

        def act(self, obs):
            # state[3:6] = obj - ee; move straight at the object
            d = obs[3:6]
            a = np.zeros(8, np.float32)
            n = np.linalg.norm(d)
            a[:3] = d / max(n, 1e-6)
            return a

    ev = Evaluator(env_name="FakeManipulation-v0", policy=GreedyPolicy(), env=env)
    result = ev.run(level_list=[0, 1, 2, 3], max_steps=60)
    assert "success" in result and 0.0 <= result["success"] <= 1.0
    ev.export_to_csv(str(tmp_path / "res.csv"))
    text = (tmp_path / "res.csv").read_text()
    assert "success" in text


def test_fake_env_eval_hysteresis():
    from pointcloud_rl_tpu.env.fake_manipulation import FakeManipulationEnv

    env = FakeManipulationEnv(obs_mode="state", keep_good_steps_threshold=3, horizon=100)
    env.reset(level=0)
    # teleport next to the object: success condition true each step, but the
    # flag must only latch after 3 consecutive good steps
    env.ee_pos = env.obj_pos.copy()
    flags = []
    for _ in range(3):
        _, _, done, info = env.step(np.zeros(8, np.float32))
        env.ee_pos = env.obj_pos.copy()  # undo drift
        flags.append(info["eval_info"]["success"])
    assert flags == [False, False, True]


def test_fake_env_camera_fusion_matches_ops_camera():
    """The env's numpy z-buffer render -> fuse pipeline must agree with the
    jittable ops/camera.py fusion on the same depth images."""
    import jax.numpy as jnp

    from pointcloud_rl_tpu.env.fake_manipulation import (
        FakeManipulationEnv,
        fuse_depth_maps,
        render_depth_maps,
    )
    from pointcloud_rl_tpu.ops.camera import fuse_camera_pointclouds

    env = FakeManipulationEnv(obs_source="cameras", n_raw_points=600)
    env.reset(level=4)
    xyz, rgb, seg = env._cloud()
    depth, rgb_img, seg_img = render_depth_maps(
        xyz, rgb, seg, env._intrinsics, env._cam2world, env.camera_hw
    )
    fx, fc, fs = fuse_depth_maps(depth, rgb_img, seg_img, env._intrinsics, env._cam2world)

    jx, jc, js = fuse_camera_pointclouds(
        jnp.asarray(depth)[None], jnp.asarray(rgb_img)[None],
        jnp.asarray(env._intrinsics), jnp.asarray(env._cam2world)[None],
        segs=jnp.asarray(seg_img)[None],
    )
    # ops/camera keeps empty pixels (depth 0 -> xyz at cam origin); filter
    mask = np.asarray(jnp.reshape(jnp.asarray(depth)[None], (1, -1))[0]) > 0
    np.testing.assert_allclose(np.asarray(jx[0])[mask], fx, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(jc[0])[mask], fc)
    np.testing.assert_array_equal(np.asarray(js[0])[mask].astype(bool), fs)

    # and the full env path produces the contract observation
    obs = env.get_obs()
    assert obs["xyz"].shape == (3, env.n_points)
    assert obs["rgb"].dtype == np.uint8 and obs["seg"].shape[0] == 2


def test_fake_env_ego_mode_reference_transform():
    from pointcloud_rl_tpu.env.fake_manipulation import FakeManipulationEnv

    env = FakeManipulationEnv(ego_mode=True)
    env.reset(level=1)
    xyz = np.array([[1.0, 0.0, 0.3]], np.float32)
    out = env._apply_ego_mode(xyz)
    # manual: shift xy by base_pos, rotate by -base_orientation about z
    ang = -env.base_orientation
    c, s = np.cos(ang), np.sin(ang)
    shifted = xyz.copy()
    shifted[0, :2] -= env.base_pos
    expected = shifted @ np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32).T
    np.testing.assert_allclose(out, expected, atol=1e-6)
    assert out[0, 2] == pytest.approx(0.3)  # z untouched


def test_handle_discovery_on_shipped_buckets():
    """Object-generic handle discovery (reference
    open_cabinet_door_drawer.py:96-184) against the shipped PartNet bucket
    URDFs: finds the handle link, samples <=100 grasp-bar points on the
    convex hull, and derives the two flat-axis grasp poses."""
    import os.path as osp

    from pointcloud_rl_tpu.env.mujoco_manipulation import ASSET_ROOT, assets_available
    from pointcloud_rl_tpu.mani.handle_discovery import (
        discover_handles,
        handle_links_by_joint_type,
        parse_urdf_handle_meshes,
    )

    if not assets_available():
        pytest.skip("PartNet-Mobility assets unavailable")
    for model_id in ("4000", "4001"):
        urdf = osp.join(ASSET_ROOT, model_id, "mobility.urdf")
        meshes = parse_urdf_handle_meshes(urdf)
        assert meshes, f"no handle visuals found in bucket {model_id}"
        info = discover_handles(urdf, seed=0)
        assert set(info) == set(meshes)
        for link, d in info.items():
            pts = d["points"]
            assert 1 <= len(pts) <= 100 and pts.shape[1] == 3
            # cropped grasp-bar points stay inside the full handle mesh bbox
            lo, hi = meshes[link].min(0) - 1e-6, meshes[link].max(0) + 1e-6
            assert (pts >= lo).all() and (pts <= hi).all()
            g0, g1 = d["grasp_poses"]
            R0 = g0.to_transformation_matrix()[:3, :3]
            np.testing.assert_allclose(R0 @ R0.T, np.eye(3), atol=1e-8)
        # the bucket handle swings on a revolute joint -> target-link choice
        # (reference _choose_target_link with joint_type="revolute")
        targets = handle_links_by_joint_type(urdf, "revolute")
        assert targets and all(t in info for t in targets), targets


def test_osc_interface_roundtrip():
    """OSC decompose/recompose identity (the reference's own osc.py test():
    joint action -> (osc, null) -> joint action reconstructs exactly), plus
    dimension bookkeeping for both robot variants."""
    from pointcloud_rl_tpu.env.a2_robot import robot_assets_available
    from pointcloud_rl_tpu.mani.osc import OperationalSpaceControlInterface

    if not robot_assets_available():
        pytest.skip("A2 robot assets unavailable")
    rs = np.random.RandomState(0)
    for env_name, n_joints in (("MoveBucket-v0", 22), ("OpenCabinetDoor-v0", 13)):
        osc = OperationalSpaceControlInterface(env_name)
        assert len(osc.joint_names) == n_joints
        assert osc.osc_dim == osc.osc_extra_dim + 6 * osc.n_arms
        for _ in range(3):
            qpos = rs.uniform(-0.5, 0.5, n_joints)
            action = rs.randn(n_joints)
            os_a, null_a = osc.joint_space_to_operational_space_and_null_space(qpos, action)
            rec = osc.operational_space_and_null_space_to_joint_space(qpos, os_a, null_a)
            np.testing.assert_allclose(rec, action, atol=1e-6)
        # driving only the hand twist leaves the null component orthogonal
        # to nothing useful to check beyond reconstruction; but a pure
        # null-space action must produce zero hand twist when decomposed
        qpos = rs.uniform(-0.5, 0.5, n_joints)
        zero_os = np.zeros(osc.osc_dim)
        null_cmd = rs.randn(osc.null_space_dim)
        joint = osc.operational_space_and_null_space_to_joint_space(qpos, zero_os, null_cmd)
        os_back, _ = osc.joint_space_to_operational_space_and_null_space(qpos, joint)
        np.testing.assert_allclose(os_back[osc.osc_extra_dim:], 0, atol=1e-8)


def test_osc_qpos_from_state_obs():
    from pointcloud_rl_tpu.env.a2_robot import robot_assets_available
    from pointcloud_rl_tpu.mani.osc import OperationalSpaceControlInterface

    if not robot_assets_available():
        pytest.skip("A2 robot assets unavailable")
    osc = OperationalSpaceControlInterface("MoveBucket-v0")
    # THIS repo's A2Robot.get_obs layout (a2_robot.py:301):
    # ee(24) base_vel(2) base_ang_vel(1) qpos(19) qvel(19) [+ base pose(3)]
    qpos_arm = np.arange(19, dtype=np.float64)
    for tail in (np.zeros(0), np.ones(3)):  # ego mode / non-ego base pose
        state = np.concatenate([np.zeros(24), np.zeros(3), qpos_arm,
                                np.zeros(19), tail]).astype(np.float32)
        q = osc.get_robot_qpos_from_obs(state)
        assert q.shape == (22,)
        np.testing.assert_array_equal(q[:3], 0)
        np.testing.assert_array_equal(q[3:], qpos_arm)
        # pointcloud-mode dict obs carries the agent block under "state"
        q2 = osc.get_robot_qpos_from_obs({"state": state})
        np.testing.assert_array_equal(q, q2)
