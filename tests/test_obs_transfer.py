"""Obs-transfer payload reductions (algorithms/obs_transfer.py).

The pos_encoding-on-device path must be EXACT: dropping the constant
one-hot block from uploads/storage and re-synthesizing it inside the
jitted programs must reproduce the baseline actions and update metrics
bit-for-bit (same seeds, same RNG stream).  float16 packing is
approximate by design and gets a loose tolerance.
"""

import jax
import numpy as np
import pytest

from pointcloud_rl_tpu.algorithms import build_agent
from pointcloud_rl_tpu.algorithms.base import pack_pointcloud_obs
from pointcloud_rl_tpu.algorithms.obs_transfer import (
    ObsTransferSpec,
    complete_obs_dict,
    complete_packed,
    make_obs_transfer,
    synth_pos_encoding,
)
from pointcloud_rl_tpu.env.device_replay import DeviceReplayMemory

F, PPF = 2, 16
N = F * PPF  # stacked point count
A = 2


def _env_params():
    from tests.test_algorithms import _Box

    obs_shape = {"xyz": (3, N), "rgb": (3, N), "pos_encoding": (F, N)}
    return dict(
        obs_shape=obs_shape,
        action_shape=(A,),
        is_discrete=False,
        action_space=_Box(-1.0, 1.0, (A,)),
    )


def _agent_cfg(**overrides):
    cfg = dict(
        type="SAC",
        batch_size=16,
        gamma=0.95,
        alpha=0.1,
        shared_backbone=True,
        detach_actor_feature=True,
        actor_cfg=dict(
            type="ContinuousActor",
            head_cfg=dict(type="TanhGaussianHead", log_std_bound=[-10, 2]),
            nn_cfg=dict(
                type="Visuomotor",
                visual_nn_cfg=dict(type="PointNet", feat_dim=6 + F, mlp_spec=[16, 32], out_channels=24,
                                   feature_transform=[], ignore_first_ln=True),
                mlp_cfg=dict(type="LinearMLP", norm_cfg=None, mlp_spec=[24, 32, A * 2],
                             inactivated_output=True),
            ),
            optim_cfg=dict(type="Adam", lr=1e-3, param_cfg={"(.*?)visual_nn(.*?)": None}),
        ),
        critic_cfg=dict(
            type="ContinuousCritic",
            num_heads=2,
            nn_cfg=dict(
                type="Visuomotor",
                visual_nn_cfg=None,
                mlp_cfg=dict(type="LinearMLP", norm_cfg=None, mlp_spec=[24 + A, 32, 1],
                             inactivated_output=True),
            ),
            optim_cfg=dict(type="Adam", lr=1e-3),
        ),
        env_params=_env_params(),
        seed=0,
    )
    cfg.update(overrides)
    return cfg


def _pos_block(m):
    return np.repeat(np.repeat(np.eye(F, dtype=np.uint8), PPF, axis=-1)[None], m, axis=0)


def _obs(m, seed=0):
    rs = np.random.RandomState(seed)
    return {
        "xyz": rs.randn(m, 3, N).astype(np.float32),
        "rgb": rs.randint(0, 255, (m, 3, N), dtype=np.uint8),
        "pos_encoding": _pos_block(m),
    }


def _transitions(n=64, seed=0):
    rs = np.random.RandomState(seed)
    return dict(
        obs=_obs(n, seed),
        next_obs=_obs(n, seed + 1),
        actions=np.clip(rs.randn(n, A), -1, 1).astype(np.float32),
        rewards=rs.randn(n, 1).astype(np.float32),
        dones=np.zeros((n, 1), bool),
        episode_dones=np.zeros((n, 1), bool),
    )


def test_make_obs_transfer_spec():
    spec = make_obs_transfer(dict(pos_encoding_on_device=True), _env_params()["obs_shape"])
    assert spec == ObsTransferSpec(F, 6, PPF, drop_pos_encoding=True, pack_dtype=None,
                                   packed_channels=6)
    # no pos_encoding in obs -> nothing to drop
    assert make_obs_transfer(dict(pos_encoding_on_device=True), {"xyz": (3, N)}) is None
    assert make_obs_transfer(None, _env_params()["obs_shape"]) is None
    # pack_dtype survives even without a pos_encoding block
    spec16 = make_obs_transfer(dict(pack_dtype="float16"), {"xyz": (3, N)})
    assert spec16.pack_dtype == np.float16 and not spec16.drop_pos_encoding


def test_synth_matches_framestack():
    got = np.asarray(synth_pos_encoding(F, PPF))
    np.testing.assert_array_equal(got, _pos_block(1)[0].astype(np.float32))


def test_complete_packed_matches_full_pack():
    obs = _obs(4)
    spec = make_obs_transfer(dict(pos_encoding_on_device=True), _env_params()["obs_shape"])
    full, _ = pack_pointcloud_obs(obs)
    small, _ = pack_pointcloud_obs(obs, spec=spec)
    assert small.shape == (4, 6, N)
    np.testing.assert_array_equal(np.asarray(complete_packed(small, spec)), full)


def test_complete_obs_dict_roundtrip():
    obs = {k: v for k, v in _obs(3).items() if k != "pos_encoding"}
    spec = make_obs_transfer(dict(pos_encoding_on_device=True), _env_params()["obs_shape"])
    done = complete_obs_dict(obs, spec)
    np.testing.assert_array_equal(np.asarray(done["pos_encoding"]), _pos_block(3).astype(np.float32))
    # presence -> no-op (same object semantics not required; values equal)
    with_pos = _obs(3)
    np.testing.assert_array_equal(
        np.asarray(complete_obs_dict(with_pos, spec)["pos_encoding"]), with_pos["pos_encoding"]
    )


def test_act_exact_with_pos_on_device():
    base = build_agent(_agent_cfg())
    opt = build_agent(_agent_cfg(obs_transfer_cfg=dict(pos_encoding_on_device=True)))
    obs = _obs(5)
    for mode in ("eval", "explore"):
        a0 = base.forward(obs, mode=mode)
        a1 = opt.forward(obs, mode=mode)
        np.testing.assert_allclose(a1, a0, rtol=0, atol=0)


def test_act_close_with_f16_pack():
    base = build_agent(_agent_cfg())
    opt = build_agent(_agent_cfg(obs_transfer_cfg=dict(pos_encoding_on_device=True, pack_dtype="float16")))
    obs = _obs(5)
    a0 = base.forward(obs, mode="eval")
    a1 = opt.forward(obs, mode="eval")
    np.testing.assert_allclose(a1, a0, atol=5e-3)


def test_device_replay_transfer_strip_and_update_exact():
    """End-to-end: replay stores obs WITHOUT pos_encoding; the scanned
    update re-synthesizes it on device.  Metrics must match the
    unstripped baseline exactly (same seeds everywhere)."""
    trans = _transitions()

    def run(transfer):
        agent = build_agent(
            _agent_cfg(obs_transfer_cfg=dict(pos_encoding_on_device=True) if transfer else None)
        )
        mem = DeviceReplayMemory(
            capacity=128, seed=0,
            keys=["obs", "next_obs", "actions", "rewards", "dones", "episode_dones"],
            transfer_cfg=dict(drop_subkeys=("pos_encoding",)) if transfer else None,
        )
        mem.push_batch(trans)
        if transfer:
            assert "pos_encoding" not in mem.storage["obs"], "pos_encoding must not be stored"
        vec = np.asarray(agent.update_parameters_scan(mem, 3))
        return vec, jax.device_get(agent.train_state.params)

    v_base, p_base = run(False)
    v_opt, p_opt = run(True)
    np.testing.assert_allclose(v_opt, v_base, rtol=1e-6, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(p_base), jax.tree_util.tree_leaves(p_opt)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6)


def test_device_replay_dtype_map():
    mem = DeviceReplayMemory(
        capacity=64, seed=0, keys=["obs", "actions"],
        transfer_cfg=dict(drop_subkeys=("pos_encoding",), dtype_map={"xyz": "float16"}),
    )
    trans = _transitions(8)
    mem.push_batch({"obs": trans["obs"], "actions": trans["actions"]})
    assert mem.storage["obs"]["xyz"].dtype == np.float16
    assert mem.storage["obs"]["rgb"].dtype == np.uint8
    assert mem.storage["actions"].dtype == np.float32
    batch = jax.device_get(mem.sample(4))
    assert batch["obs"]["xyz"].dtype == np.float16


def test_eval_path_with_transfer():
    """The eval/evaluation path rides the same forward_async -> packed act
    program."""
    agent = build_agent(_agent_cfg(obs_transfer_cfg=dict(pos_encoding_on_device=True)))
    obs = _obs(2)
    a = agent.forward(obs, mode="eval")
    assert a.shape == (2, A) and np.isfinite(a).all()


def test_complete_packed_full_array_noop_and_host_replay_transfer():
    """A pre-packed FULL obs array must pass through complete_packed
    unchanged (no double insert), and the host ReplayMemory honors the same
    transfer_cfg the device replay does (incl. top-level keys)."""
    from pointcloud_rl_tpu.env.replay import ReplayMemory

    spec = make_obs_transfer(dict(pos_encoding_on_device=True), _env_params()["obs_shape"])
    obs = _obs(4)
    full, _ = pack_pointcloud_obs(obs)
    out = np.asarray(complete_packed(np.asarray(full), spec))
    np.testing.assert_array_equal(out, full)

    mem = ReplayMemory(capacity=64, transfer_cfg=dict(
        drop_subkeys=("pos_encoding",), dtype_map={"xyz": "float16", "rewards": "float16"}))
    mem.push_batch(_transitions(8))
    batch = mem.sample(4)
    assert "pos_encoding" not in batch["obs"]
    assert batch["obs"]["xyz"].dtype == np.float16
    assert batch["rewards"].dtype == np.float16  # top-level dtype_map applies


def test_host_replay_rejects_then_accepts_transfer_kwarg_config_chain():
    """Regression: the DMC base config sets replay transfer_cfg; configs that
    override the replay type back to the host ReplayMemory (pn_rnn) inherit
    the key and must still construct."""
    from pointcloud_rl_tpu.config import Config
    from pointcloud_rl_tpu.env import build_replay

    cfg = Config.fromfile("configs/mfrl/sac/dm_control/pn_rnn.py")
    replay = build_replay(cfg["replay_cfg"])
    assert type(replay).__name__ == "ReplayMemory"
    assert replay.transfer_cfg == dict(drop_subkeys=("pos_encoding",))


def test_act_exact_with_dict_mode():
    """pack_mode='dict' ships native leaves (rgb uint8); the /255 then runs
    on device where XLA may fuse it differently than host numpy (reciprocal
    multiply), so parity is float-rounding-exact rather than bitwise."""
    base = build_agent(_agent_cfg())
    opt = build_agent(_agent_cfg(obs_transfer_cfg=dict(pos_encoding_on_device=True, pack_mode="dict")))
    obs = _obs(5)
    for mode in ("eval", "explore"):
        np.testing.assert_allclose(opt.forward(obs, mode=mode), base.forward(obs, mode=mode),
                                   rtol=0, atol=1e-6)


def test_act_close_with_dict_mode_f16_xyz():
    base = build_agent(_agent_cfg())
    opt = build_agent(_agent_cfg(obs_transfer_cfg=dict(
        pos_encoding_on_device=True, pack_mode="dict", pack_dtype="float16")))
    obs = _obs(5)
    np.testing.assert_allclose(opt.forward(obs, mode="eval"), base.forward(obs, mode="eval"), atol=5e-3)


def test_pack_device_features_matches_preprocess():
    """pack_features storage (obs_transfer.pack_device_features) must glue
    the SAME model-input tensor preprocess_pointcloud assembles from the raw
    dict — same channel order (xyz, rgb/255, pos_encoding, seg), channel-last,
    just pre-computed once at push time."""
    import jax.numpy as jnp

    from pointcloud_rl_tpu.algorithms.obs_transfer import pack_device_features
    from pointcloud_rl_tpu.models.pointnet import preprocess_pointcloud

    obs = _obs(4)
    obs["seg"] = (np.random.RandomState(3).rand(4, 2, N) > 0.5).astype(np.uint8)
    obs["state"] = np.random.RandomState(4).randn(4, 7).astype(np.float32)

    ref = np.asarray(preprocess_pointcloud({k: v for k, v in obs.items() if k != "state"}))
    packed = pack_device_features(obs, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(packed["pcd"]), ref, rtol=0, atol=0)
    np.testing.assert_allclose(np.asarray(packed["state"]), obs["state"], rtol=0, atol=0)

    # bf16 storage == one cast of the identical f32 tensor
    packed16 = pack_device_features(obs, dtype=jnp.bfloat16)
    np.testing.assert_allclose(
        np.asarray(packed16["pcd"], np.float32),
        np.asarray(jnp.asarray(ref).astype(jnp.bfloat16), np.float32), rtol=0, atol=0)

    # and preprocess_pointcloud passes a packed dict through untouched
    out = preprocess_pointcloud({"pcd": packed16["pcd"]})
    assert out.dtype == jnp.bfloat16 and out.shape == ref.shape


def test_device_replay_pack_features_update_close():
    """End-to-end: replay stores the pre-glued bf16 model-input tensor
    (pack_features=True); the scanned update consumes {"pcd": ...} obs
    directly.  Metrics track the raw-dict baseline to bf16 tolerance (the
    baseline computes the same features in f32 and casts at the matmul)."""
    trans = _transitions()

    def run(pack):
        agent = build_agent(_agent_cfg())
        mem = DeviceReplayMemory(
            capacity=128, seed=0,
            keys=["obs", "next_obs", "actions", "rewards", "dones", "episode_dones"],
            transfer_cfg=dict(pack_features=True) if pack else None,
        )
        mem.push_batch(trans)
        if pack:
            obs = mem.storage["obs"]
            assert set(obs) == {"pcd"} and str(obs["pcd"].dtype) == "bfloat16"
            assert obs["pcd"].shape == (128, N, 3 + 3 + F)  # channel-last
        vec = np.asarray(agent.update_parameters_scan(mem, 3))
        assert np.isfinite(vec).all()
        return vec

    v_base = run(False)
    v_pack = run(True)
    np.testing.assert_allclose(v_pack, v_base, rtol=0.15, atol=0.05)


def test_drq_pack_features_update_close():
    """DrQ x pack_features (the aug-on-packed fast path,
    ops/augment.py:apply_augs_to_packed): the scanned K-fold-augmented
    update runs on packed storage and tracks the raw-dict DrQ baseline to
    bf16 tolerance — this is what keeps the walker DrQ protocol on the
    HBM-packed replay instead of re-running obs prep per sample."""
    trans = _transitions()

    def run(pack):
        cfg = _agent_cfg(
            type="DrQ", num_aug=2, svea=False,
            obs_aug=dict(type="GlobalRotScaleTrans", main_key="xyz", req_keys=["xyz"],
                         rot_range=None, scale_ratio_range=None,
                         translation_range=[0.04, 0, 0.04], shift_height=True),
        )
        agent = build_agent(cfg)
        mem = DeviceReplayMemory(
            capacity=128, seed=0,
            keys=["obs", "next_obs", "actions", "rewards", "dones", "episode_dones"],
            transfer_cfg=dict(pack_features=True) if pack else None,
        )
        mem.push_batch(trans)
        vec = np.asarray(agent.update_parameters_scan(mem, 3))
        assert np.isfinite(vec).all()
        return vec

    v_base = run(False)
    v_pack = run(True)
    np.testing.assert_allclose(v_pack, v_base, rtol=0.15, atol=0.05)


def test_drq_pack_features_rejects_rgb_augs():
    cfg = _agent_cfg(
        type="DrQ", num_aug=2, svea=False,
        obs_aug=dict(type="ColorJitterPoints", main_key="rgb", req_keys=["rgb"],
                     brightness=0.4, contrast=0.4, saturation=0.4, hue=0.5),
    )
    agent = build_agent(cfg)
    mem = DeviceReplayMemory(
        capacity=64, seed=0,
        keys=["obs", "next_obs", "actions", "rewards", "dones", "episode_dones"],
        transfer_cfg=dict(pack_features=True),
    )
    mem.push_batch(_transitions())
    with pytest.raises(AssertionError, match="xyz-only"):
        agent.update_parameters_scan(mem, 1)
