"""Golden augmentation parity vs the reference torch implementations.

Loads the reference's own ``pyrl/utils/augmentations/pcd_aug.py`` /
``image_aug.py`` (torch-CPU, via tests/golden/ref_stubs.py) and compares
our pure-JAX augmentations (pointcloud_rl_tpu/ops/augment.py) tensor for
tensor.  RNG disciplines differ (torch vs jax PRNG), so each test bypasses
sampling and injects IDENTICAL transform parameters into both sides — the
rot/scale/trans matrix, the downsample index, the jitter noise, the crop
offsets — exactly the "bit-compatible augmentation semantics" clause of
BASELINE.json.

Not golden-testable here (documented):
- ColorJitterPoints: the reference delegates to torchvision's ColorJitter
  (pcd_aug.py:289), and torchvision is absent from this image (stubbed as a
  MagicMock by ref_stubs) — the reference path cannot execute.  Ours is
  self-consistency-tested in tests/test_augment.py.
- GlobalRotScaleTrans translation sampling: the reference zeroes
  ``delta_xyz[-1]`` (pcd_aug.py:196) which kills the LAST BATCH ROW's
  translation, not the z component — a reference bug.  We implement the
  intended z-zeroing; the injected-matrix tests below compare the transform
  APPLICATION, which is identical.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from pointcloud_rl_tpu.ops import augment as ours


@pytest.fixture(scope="module")
def ref_augs():
    """Reference pcd_aug + image_aug modules with deps stubbed."""
    from golden.ref_stubs import load_reference_sac

    load_reference_sac()  # installs stubs + sys.path
    from pyrl.utils.augmentations import image_aug, pcd_aug

    return pcd_aug, image_aug


def _t(x):
    return torch.as_tensor(np.asarray(x))


# ------------------------------------------------------- GlobalRotScaleTrans
def _make_mat(B, seed, scale=True, trans=True):
    """One [B, 4, 4] transform the way the reference builds it
    (pcd_aug.py:178-198): rot rows scaled per-row, translation column set
    AFTER scaling (so translation is unscaled)."""
    rng = np.random.RandomState(seed)
    angle = rng.uniform(-0.78539816, 0.78539816, size=(B,)).astype(np.float32)
    c, s = np.cos(angle), np.sin(angle)
    rot = np.zeros((B, 3, 3), np.float32)
    rot[:, 0, 0], rot[:, 0, 1] = c, -s
    rot[:, 1, 0], rot[:, 1, 1] = s, c
    rot[:, 2, 2] = 1.0
    if scale:
        rot *= rng.uniform(0.95, 1.05, size=(B, 3, 1)).astype(np.float32)
    delta = (rng.uniform(0, 1, size=(B, 3)).astype(np.float32) - 0.5) * 2 * np.array([0.1, 0.1, 0.0], np.float32) if trans else np.zeros((B, 3), np.float32)
    mat = np.zeros((B, 4, 4), np.float32)
    mat[:, 3, 3] = 1.0
    mat[:, :3, :3] = rot
    mat[:, :3, 3] = delta
    return mat


@pytest.mark.parametrize("key,shape", [
    ("obs/pointcloud/xyz", (4, 3, 96)),   # [B, 3, N] scene points
    ("obs/state/ee_pos", (4, 3)),          # [B, 3] vector
    ("obs/state/ee_vel", (4, 3)),          # velocity: rotate+scale, no trans
    ("obs/state/base_vel", (4, 2, 5)),     # 2D velocity rows: top-left 2x2
])
def test_global_rot_scale_trans_matches_reference(ref_augs, key, shape):
    pcd_aug, _ = ref_augs
    B = shape[0]
    mat = _make_mat(B, seed=hash(key) % 1000)
    data = np.random.RandomState(7).uniform(-1, 1, size=shape).astype(np.float32)

    # NB: the reference's default main_key=["obs/pointcloud/xyz"] (a list)
    # fails its own BaseAugmentation assert; configs pass strings.
    ref = pcd_aug.GlobalRotScaleTrans(main_key="obs/pointcloud/xyz",
                                      req_keys=["obs/pointcloud/xyz", key])
    ref.infos = _t(mat)  # inject: skip sampling (pcd_aug.py:180-198)
    ref_out = ref.process_single(_t(data), key).numpy()

    our = ours.GlobalRotScaleTrans(main_key="xyz", req_keys=("xyz",))
    info = (jnp.asarray(mat[:, :3, :3]), jnp.asarray(mat[:, :3, 3]))
    our_out = np.asarray(our.apply_single(jnp.asarray(data), key, info, jax.random.PRNGKey(0)))

    np.testing.assert_allclose(our_out, ref_out, rtol=1e-5, atol=1e-6)


def test_global_rot_no_trans_matches_reference(ref_augs):
    """translation_range=None: reference passes with_xyz=False (pcd_aug.py:213)."""
    pcd_aug, _ = ref_augs
    mat = _make_mat(3, seed=11, trans=False)
    data = np.random.RandomState(3).uniform(-1, 1, size=(3, 3, 64)).astype(np.float32)

    ref = pcd_aug.GlobalRotScaleTrans(main_key="obs/pointcloud/xyz",
                                      req_keys=["obs/pointcloud/xyz"],
                                      translation_range=None)
    ref.infos = _t(mat)
    ref_out = ref.process_single(_t(data), "obs/pointcloud/xyz").numpy()

    our = ours.GlobalRotScaleTrans(main_key="xyz", translation_range=None)
    info = (jnp.asarray(mat[:, :3, :3]), jnp.asarray(mat[:, :3, 3]))
    our_out = np.asarray(our.apply_single(jnp.asarray(data), "obs/pointcloud/xyz", info, jax.random.PRNGKey(0)))
    np.testing.assert_allclose(our_out, ref_out, rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------- RandomDownSample
def test_random_downsample_matches_reference(ref_augs):
    pcd_aug, _ = ref_augs
    B, N, keep = 4, 100, 80
    data = np.random.RandomState(5).uniform(-1, 1, size=(B, 3, N)).astype(np.float32)
    index = np.random.RandomState(6).permutation(N)[:keep]

    ref = pcd_aug.RandomDownSample(main_key="inputs/xyz", req_keys=["inputs/xyz"], drop_ratio=0.2)
    ref.infos = (keep, torch.as_tensor(index))  # inject (pcd_aug.py:252)
    ref_out = ref.process_single(_t(data), "inputs/xyz")
    ref_out = ref_out.numpy() if torch.is_tensor(ref_out) else np.asarray(ref_out)

    our = ours.RandomDownSample(main_key="xyz", drop_ratio=0.2)
    our_out = np.asarray(our.apply_single(jnp.asarray(data), "xyz", (jnp.asarray(index), None), jax.random.PRNGKey(0)))

    np.testing.assert_array_equal(our_out, ref_out)


# --------------------------------------------------------- RandomJitterPoints
def test_random_jitter_matches_reference(ref_augs, monkeypatch):
    """Inject the same noise tensor into both sides (the op is data + noise;
    reference pcd_aug.py:316-322)."""
    pcd_aug, _ = ref_augs
    B, N = 4, 64
    data = np.random.RandomState(9).uniform(-1, 1, size=(B, 3, N)).astype(np.float32)
    noise = np.random.RandomState(10).uniform(-0.1, 0.1, size=(B, 3, N)).astype(np.float32)

    class _FixedTensor:
        def __init__(self, *shape):
            assert tuple(shape) == noise.shape

        def uniform_(self, lo, hi):
            assert (lo, hi) == (-0.1, 0.1)
            return torch.as_tensor(noise)

    monkeypatch.setattr(torch, "FloatTensor", _FixedTensor)
    ref = pcd_aug.RandomJitterPoints(main_key="inputs/xyz", req_keys=["inputs/xyz"])
    ref_out = ref.process_single(_t(data), "inputs/xyz").numpy()

    our = ours.RandomJitterPoints(main_key="xyz")
    monkeypatch.setattr(jax.random, "uniform",
                        lambda rng, shape, dtype=jnp.float32, minval=0.0, maxval=1.0: jnp.asarray(noise))
    our_out = np.asarray(our.apply_single(jnp.asarray(data), "xyz", None, jax.random.PRNGKey(0)))

    np.testing.assert_allclose(our_out, ref_out, rtol=1e-6, atol=1e-7)


# ------------------------------------------------------------- image RandomCrop
def test_random_crop_matches_reference(ref_augs, monkeypatch):
    """DrQ shift crop, pure-torch gather path (image_aug.py:85-96), offsets
    injected via torch.randint.  padding=None (the torchvision pad helper is
    stubbed in this image); input pre-padded so a real crop happens."""
    _, image_aug = ref_augs
    B, C, H, W, size = 4, 3, 72, 72, 64
    data = np.random.RandomState(13).randint(0, 255, size=(B, C, H, W)).astype(np.float32)
    i0 = np.random.RandomState(14).randint(0, H - size + 1, size=(B,))
    j0 = np.random.RandomState(15).randint(0, W - size + 1, size=(B,))

    offsets = [torch.as_tensor(i0), torch.as_tensor(j0)]
    real_randint = torch.randint

    def fake_randint(low, high, size=None, device=None, **kw):
        if size == (B,) or (hasattr(size, "__len__") and tuple(size) == (B,)):
            return offsets.pop(0)
        return real_randint(low, high, size=size, device=device, **kw)

    monkeypatch.setattr(torch, "randint", fake_randint)
    ref = image_aug.RandomCrop(size=size)
    ref_out = ref.process({"rgb": _t(data)})["rgb"].numpy()

    our = ours.RandomCrop(main_key="rgb", size=size)
    our_out = np.asarray(our.apply_single(jnp.asarray(data), "rgb", (jnp.asarray(i0), jnp.asarray(j0)), jax.random.PRNGKey(0)))

    np.testing.assert_array_equal(our_out, ref_out)


def test_random_crop_batched_frames_matches_reference(ref_augs, monkeypatch):
    """[B, K, C, H, W] stacked-frame layout: one offset per (B, K) slot."""
    _, image_aug = ref_augs
    B, K, C, H, W, size = 2, 3, 3, 40, 40, 32
    data = np.random.RandomState(21).randint(0, 255, size=(B, K, C, H, W)).astype(np.float32)
    i0 = np.random.RandomState(22).randint(0, H - size + 1, size=(B, K))
    j0 = np.random.RandomState(23).randint(0, W - size + 1, size=(B, K))

    offsets = [torch.as_tensor(i0), torch.as_tensor(j0)]
    real_randint = torch.randint

    def fake_randint(low, high, size=None, device=None, **kw):
        if size is not None and tuple(size) == (B, K):
            return offsets.pop(0)
        return real_randint(low, high, size=size, device=device, **kw)

    monkeypatch.setattr(torch, "randint", fake_randint)
    ref = image_aug.RandomCrop(size=size)
    ref_out = ref.process({"rgb": _t(data)})["rgb"].numpy()

    our = ours.RandomCrop(main_key="rgb", size=size)
    our_out = np.asarray(our.apply_single(jnp.asarray(data), "rgb", (jnp.asarray(i0), jnp.asarray(j0)), jax.random.PRNGKey(0)))

    np.testing.assert_array_equal(our_out, ref_out)
