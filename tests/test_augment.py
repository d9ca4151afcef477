"""Augmentation kernel tests: transform sharing across keys, rotation
geometry, velocity-key semantics, crop shapes/bounds, color jitter ranges."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointcloud_rl_tpu.ops.augment import build_data_augmentations, rot_matrix_about_axis


def test_rot_matrix_about_axis():
    angle = jnp.asarray([np.pi / 2])
    Rz = np.asarray(rot_matrix_about_axis(angle, 2))[0]
    np.testing.assert_allclose(Rz @ [1, 0, 0], [0, 1, 0], atol=1e-6)
    Rx = np.asarray(rot_matrix_about_axis(angle, 0))[0]
    np.testing.assert_allclose(Rx @ [0, 1, 0], [0, 0, 1], atol=1e-6)


def test_global_rot_scale_trans_geometry():
    aug = build_data_augmentations([dict(
        type="GlobalRotScaleTrans", main_key="xyz", req_keys=["xyz"],
        rot_range=[-0.8, 0.8], scale_ratio_range=None, translation_range=None,
    )])
    rs = np.random.RandomState(0)
    xyz = jnp.asarray(rs.randn(4, 3, 32), jnp.float32)
    out = aug(jax.random.PRNGKey(0), {"xyz": xyz})["xyz"]
    # pure rotation about z preserves norms and the z coordinate
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out), axis=1), np.linalg.norm(np.asarray(xyz), axis=1), rtol=1e-5
    )
    np.testing.assert_allclose(np.asarray(out)[:, 2], np.asarray(xyz)[:, 2], atol=1e-6)
    # different batch elements get different rotations
    d0 = np.abs(np.asarray(out)[0] - np.asarray(xyz)[0]).max()
    assert d0 > 1e-4


def test_global_trans_shares_transform_and_skips_vel():
    aug = build_data_augmentations([dict(
        type="GlobalRotScaleTrans", main_key="xyz",
        req_keys=["xyz", "ee_pos", "ee_vel"],
        rot_range=None, scale_ratio_range=None,
        translation_range=[0.5, 0.5, 0.5], shift_height=True,
    )])
    rs = np.random.RandomState(1)
    data = {
        "xyz": jnp.asarray(rs.randn(3, 3, 16), jnp.float32),
        "ee_pos": jnp.asarray(rs.randn(3, 3), jnp.float32),
        "ee_vel": jnp.asarray(rs.randn(3, 3), jnp.float32),
    }
    out = aug(jax.random.PRNGKey(3), data)
    shift_pts = np.asarray(out["xyz"] - data["xyz"])  # [B, 3, N]
    shift_pos = np.asarray(out["ee_pos"] - data["ee_pos"])  # [B, 3]
    # same per-batch translation applied to every point and to the position key
    np.testing.assert_allclose(shift_pts, np.broadcast_to(shift_pos[..., None], shift_pts.shape), atol=1e-5)
    # velocity keys rotate but never translate (identity rotation here)
    np.testing.assert_allclose(np.asarray(out["ee_vel"]), np.asarray(data["ee_vel"]), atol=1e-6)
    assert np.abs(shift_pos).max() > 1e-3


def test_random_downsample_fixed_and_random():
    rs = np.random.RandomState(2)
    data = {"xyz": jnp.asarray(rs.randn(2, 3, 40), jnp.float32),
            "rgb": jnp.asarray(rs.randint(0, 255, (2, 3, 40)), jnp.uint8)}
    aug = build_data_augmentations([dict(type="RandomDownSample", main_key="xyz",
                                         req_keys=["xyz", "rgb"], drop_ratio=0.25)])
    out = aug(jax.random.PRNGKey(0), data)
    assert out["xyz"].shape == (2, 3, 30) and out["rgb"].shape == (2, 3, 30)
    # fixed_ratio=False keeps N via duplicate padding (static shapes)
    aug = build_data_augmentations([dict(type="RandomDownSample", main_key="xyz",
                                         req_keys=["xyz", "rgb"], drop_ratio=0.25, fixed_ratio=False)])
    out = aug(jax.random.PRNGKey(1), data)
    assert out["xyz"].shape == (2, 3, 40)
    # duplicates exist or not depending on draw, but the point SET is a subset
    orig = set(map(tuple, np.asarray(data["xyz"][0]).T.round(5)))
    new = set(map(tuple, np.asarray(out["xyz"][0]).T.round(5)))
    assert new.issubset(orig)


def test_random_crop_shapes_and_content():
    rs = np.random.RandomState(3)
    img = jnp.asarray(rs.randint(0, 255, (4, 9, 84, 84)), jnp.uint8)
    aug = build_data_augmentations([dict(type="RandomCrop", main_key="rgb", req_keys=["rgb"],
                                         size=[84, 84], padding=4, padding_mode="edge")])
    out = aug(jax.random.PRNGKey(0), {"rgb": img})["rgb"]
    assert out.shape == (4, 9, 84, 84) and out.dtype == jnp.uint8
    # at least one batch element differs from identity (shifted)
    assert any(not np.array_equal(np.asarray(out[i]), np.asarray(img[i])) for i in range(4))


def test_color_jitter_range_and_dtype():
    rs = np.random.RandomState(4)
    rgb = jnp.asarray(rs.randint(0, 255, (2, 3, 64)), jnp.uint8)
    aug = build_data_augmentations([dict(type="ColorJitterPoints", main_key="rgb", req_keys=["rgb"],
                                         brightness=0.4, contrast=0.4, saturation=0.4, hue=0.5)])
    out = aug(jax.random.PRNGKey(5), {"rgb": rgb})["rgb"]
    assert out.dtype == jnp.uint8 and out.shape == rgb.shape
    assert not np.array_equal(np.asarray(out), np.asarray(rgb))


def test_jitter_bounds():
    xyz = jnp.zeros((2, 3, 16), jnp.float32)
    aug = build_data_augmentations([dict(type="RandomJitterPoints", main_key="xyz",
                                         req_keys=["xyz"], jitter_range=[-0.01, 0.01])])
    out = aug(jax.random.PRNGKey(0), {"xyz": xyz})["xyz"]
    assert float(jnp.abs(out).max()) <= 0.01
    assert float(jnp.abs(out).max()) > 0


def test_add_origin_ball():
    rs = np.random.RandomState(5)
    data = {"xyz": jnp.asarray(rs.randn(2, 3, 20) + 3.0, jnp.float32),
            "rgb": jnp.asarray(rs.randint(0, 255, (2, 3, 20)), jnp.uint8),
            "seg": jnp.ones((2, 2, 20), jnp.float32)}
    aug = build_data_augmentations([dict(type="AddOriginBall", n_pts=10, noise_std=0.02)])
    out = aug(jax.random.PRNGKey(0), data)
    assert out["xyz"].shape == (2, 3, 30)
    assert out["seg"].shape == (2, 2, 30)
    # appended points cluster at the origin, with zero seg/rgb
    assert float(jnp.abs(out["xyz"][:, :, 20:]).max()) < 0.2
    assert float(out["seg"][:, :, 20:].sum()) == 0


def _dsf_cfg(**over):
    cfg = dict(
        type="RandomDownSampleAndFilter", main_key="xyz",
        req_keys=["xyz", "rgb", "pos_encoding"],
        func_keys=["xyz", "filter_seg"], func_key_map='lambda _: _.split("_")[-1]',
        n_points=8, n_fg=5, stack_frame=1,
    )
    cfg.update(over)
    return [cfg]


def _dsf_data(rs, batch=2, n=24, stack=1, fg_per_frame=None):
    """Cloud where xyz encodes the source point index so selections are
    traceable; rgb = index too (same-gather check)."""
    N = n * stack
    idx = np.arange(N, dtype=np.float32)
    xyz = np.stack([np.tile(idx, (batch, 1))] * 3, axis=1)  # [B, 3, N]
    seg = np.zeros((batch, 1, N), np.uint8)
    for f in range(stack):
        k = n if fg_per_frame is None else fg_per_frame
        seg[:, :, f * n: f * n + k] = 1
    pos = np.repeat(np.eye(stack, dtype=np.uint8), n, axis=-1)
    data = {"xyz": jnp.asarray(xyz), "rgb": jnp.asarray(xyz.astype(np.uint8)),
            "pos_encoding": jnp.asarray(np.tile(pos, (batch, 1, 1))),
            "filter_seg": jnp.asarray(seg)}
    return data


def test_downsample_and_filter_budget_split():
    rs = np.random.RandomState(0)
    data = _dsf_data(rs, n=24, fg_per_frame=12)  # plenty on both sides
    aug = build_data_augmentations(_dsf_cfg())
    out = aug(jax.random.PRNGKey(0), data)
    assert out["xyz"].shape == (2, 3, 8)
    assert out["rgb"].shape == (2, 3, 8)
    assert out["filter_seg"].shape == (2, 1, 8)
    seg = np.asarray(out["filter_seg"])[:, 0]
    # first n_fg slots foreground, the rest background — exactly the budget
    assert (seg[:, :5] == 1).all() and (seg[:, 5:] == 0).all()
    # the same indices were gathered from every key
    np.testing.assert_array_equal(np.asarray(out["xyz"][:, 0]).astype(np.uint8),
                                  np.asarray(out["rgb"][:, 0]))
    # foreground slots actually come from the seg=1 index range [0, 12)
    assert np.asarray(out["xyz"][:, 0, :5]).max() < 12
    assert np.asarray(out["xyz"][:, 0, 5:]).min() >= 12


def test_downsample_and_filter_pad_by_tiling():
    rs = np.random.RandomState(1)
    data = _dsf_data(rs, n=24, fg_per_frame=3)  # only 3 fg points for a 5 budget
    aug = build_data_augmentations(_dsf_cfg())
    out = aug(jax.random.PRNGKey(0), data)
    fg = np.asarray(out["xyz"][:, 0, :5])
    assert (fg < 3).all()  # all picks from the 3 available fg points
    for b in range(fg.shape[0]):
        assert len(np.unique(fg[b])) == 3  # wrapped, not truncated


def test_downsample_and_filter_empty_side_zero_fill():
    rs = np.random.RandomState(2)
    data = _dsf_data(rs, n=24, fg_per_frame=0)  # no foreground at all
    aug = build_data_augmentations(_dsf_cfg())
    out = aug(jax.random.PRNGKey(0), data)
    assert float(np.abs(np.asarray(out["xyz"][:, :, :5])).max()) == 0.0
    assert float(np.asarray(out["rgb"][:, :, :5]).max()) == 0.0
    seg = np.asarray(out["filter_seg"])[:, 0]
    assert (seg[:, :5] == 0).all()


def test_downsample_and_filter_stacked_frames():
    rs = np.random.RandomState(3)
    data = _dsf_data(rs, n=24, stack=3, fg_per_frame=12)
    aug = build_data_augmentations(_dsf_cfg(stack_frame=3))
    out = aug(jax.random.PRNGKey(0), data)
    assert out["xyz"].shape == (2, 3, 24)  # 3 frames x 8 points
    assert out["pos_encoding"].shape == (2, 3, 24)
    src = np.asarray(out["xyz"][:, 0]).astype(int)
    pos = np.asarray(out["pos_encoding"])
    for f in range(3):
        block = src[:, f * 8:(f + 1) * 8]
        assert (block >= f * 24).all() and (block < (f + 1) * 24).all()
        # pos_encoding rides the same gather: frame block stays one-hot f
        np.testing.assert_array_equal(pos[:, f, f * 8:(f + 1) * 8], 1)
    # per-frame budget: 5 fg (< f*24+12) then 3 bg in each frame block
    for f in range(3):
        block = src[:, f * 8:(f + 1) * 8] - f * 24
        assert (block[:, :5] < 12).all() and (block[:, 5:] >= 12).all()


def test_downsample_and_filter_jits():
    rs = np.random.RandomState(4)
    data = _dsf_data(rs, n=24, fg_per_frame=12)
    aug = build_data_augmentations(_dsf_cfg())
    jitted = jax.jit(lambda k, d: aug(k, d))
    out = jitted(jax.random.PRNGKey(0), data)
    assert out["xyz"].shape == (2, 3, 8)


def test_apply_augs_to_packed_matches_dict_path():
    """Packed-storage aug fast path (DrQ x pack_features): transforming the
    xyz channel block of the glued model-input tensor must equal running the
    same stack on the raw dict (identical rng folding), with every non-xyz
    channel untouched."""
    from pointcloud_rl_tpu.algorithms.obs_transfer import pack_device_features
    from pointcloud_rl_tpu.ops.augment import apply_augs_to_packed, augs_are_xyz_only

    rs = np.random.RandomState(0)
    B, N, F = 4, 12, 3
    obs = {
        "xyz": rs.randn(B, 3, N).astype(np.float32),
        "rgb": rs.randint(0, 255, (B, 3, N)).astype(np.uint8),
        "pos_encoding": np.repeat(np.eye(F, dtype=np.float32), N // F, -1)[None].repeat(B, 0),
    }
    aug = build_data_augmentations(dict(
        type="GlobalRotScaleTrans", main_key="xyz", req_keys=["xyz"],
        rot_range=[-0.5, 0.5], scale_ratio_range=[0.9, 1.1],
        translation_range=[0.04, 0, 0.04], shift_height=True))
    assert augs_are_xyz_only(aug)
    packed = pack_device_features(obs, dtype=jnp.float32)  # f32: exact compare
    key = jax.random.PRNGKey(7)
    out_packed = apply_augs_to_packed(aug, key, packed)["pcd"]
    out_dict = aug(key, obs)
    np.testing.assert_allclose(
        np.swapaxes(np.asarray(out_packed[..., :3]), -1, -2),
        np.asarray(out_dict["xyz"]), rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(out_packed[..., 3:]),
                                  np.asarray(packed["pcd"][..., 3:]))
    # rgb-touching stacks must NOT take the packed path
    cj = build_data_augmentations(dict(type="ColorJitterPoints", main_key="rgb",
                                       req_keys=["rgb"], brightness=0.4,
                                       contrast=0.4, saturation=0.4, hue=0.5))
    assert not augs_are_xyz_only(cj)
