"""Pure-JAX data augmentations, designed to run INSIDE the jitted update.

Parity targets: reference ``pyrl/utils/augmentations/{builder,pcd_aug,
image_aug}.py``.  Each augmentation is a pure function over (rng, data-dict):
the same sampled transform is applied to every requested key (the reference's
``infos`` caching), sampling is per batch element where the reference does
so, and "vel" keys rotate but do not translate.  Because the transforms are
jittable, DrQ folds them into the update step — no torchvision/kornia CUDA
calls, no host round-trips.

Layout contract: point clouds are channel-first ``[B, 3, N]`` leaves (env
contract), robot state vectors ``[B, 3]``/``[B, 2]``, images ``[B, C, H, W]``.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..registry import Registry, build_from_cfg

AUGMENTATIONS = Registry("augmentation")


# ---------------------------------------------------------------- tree paths
def path_get(data, path: str):
    node = data
    for part in path.strip("/").split("/"):
        if part not in node:
            return None
        node = node[part]
    return node


def path_set(data, path: str, value) -> None:
    parts = path.strip("/").split("/")
    node = data
    for part in parts[:-1]:
        node = node[part]
    node[parts[-1]] = value


def _shallow_copy(data):
    if isinstance(data, dict):
        return {k: _shallow_copy(v) for k, v in data.items()}
    return data


class BaseAugmentation:
    """Same-transform-across-keys contract (reference builder.py:49-96)."""

    def __init__(self, main_key=None, req_keys=None):
        self.main_key = main_key
        self.req_keys = list(req_keys) if req_keys is not None else ([main_key] if main_key else None)

    def sample_info(self, rng, main_data):
        return None

    def apply_single(self, data, key, info, rng):
        return data

    def __call__(self, rng, data):
        data = _shallow_copy(data)
        main = path_get(data, self.main_key) if self.main_key else data
        info_rng, apply_rng = jax.random.split(rng)
        info = self.sample_info(info_rng, main)
        keys = self.req_keys if self.req_keys else [None]
        for i, key in enumerate(keys):
            sub_rng = jax.random.fold_in(apply_rng, i)
            if key is None:
                data = self.apply_single(data, None, info, sub_rng)
            else:
                item = path_get(data, key)
                if item is not None:
                    path_set(data, key, self.apply_single(item, key, info, sub_rng))
        return data


class DataAugmentations:
    """Compose; splits the rng per transform (reference DataAugmentations)."""

    def __init__(self, transforms: Sequence):
        self.transforms = []
        for t in transforms:
            if isinstance(t, dict):
                t = build_from_cfg(dict(t), AUGMENTATIONS)
            self.transforms.append(t)

    def __call__(self, rng, data):
        for i, t in enumerate(self.transforms):
            data = t(jax.random.fold_in(rng, i), data)
        return data


def build_data_augmentations(cfg) -> Optional[DataAugmentations]:
    if cfg is None:
        return None
    if not isinstance(cfg, (list, tuple)):
        cfg = [cfg]
    return DataAugmentations(cfg)


def augs_are_xyz_only(augs: Optional[DataAugmentations]) -> bool:
    """True when every transform in the stack touches only the ``xyz`` key —
    the precondition for applying the stack to packed replay storage (the
    glued model-input tensor keeps xyz as its first 3 channels)."""
    if augs is None:
        return True
    return all(
        t.main_key == "xyz" and list(t.req_keys or []) == ["xyz"]
        for t in augs.transforms
    )


def apply_augs_to_packed(augs: DataAugmentations, rng, obs: Dict[str, Any]) -> Dict[str, Any]:
    """Run an xyz-only augmentation stack directly on packed replay storage.

    ``obs["pcd"]`` is the glued channel-LAST model-input tensor
    ``[..., N, C]`` built by ``pack_device_features`` (channel order xyz,
    rgb, pos_encoding, seg — reference pointnet.py:49-73), usually bf16.
    The xyz block is the first 3 channels by construction; it is lifted to
    the aug stack's native ``[B, 3, N]`` f32 layout, transformed by the SAME
    DataAugmentations object (identical rng folding -> identical sampled
    transforms as the dict path), and spliced back in the storage dtype.

    This is what lets DrQ keep the pack_features fast path: without it the
    K-fold aug forces raw-dict storage and every update re-runs the full
    obs prep (measured 81 vs ~200 updates/s on v5e at walker shapes).
    """
    pcd = obs["pcd"]
    xyz = jnp.swapaxes(pcd[..., :3], -1, -2).astype(jnp.float32)  # [B, 3, N]
    out = augs(rng, {"xyz": xyz})
    aug_xyz = jnp.swapaxes(out["xyz"], -1, -2).astype(pcd.dtype)
    obs = dict(obs)
    obs["pcd"] = jnp.concatenate([aug_xyz, pcd[..., 3:]], axis=-1)
    return obs


# ------------------------------------------------------------- point clouds
def rot_matrix_about_axis(angle, axis: int):
    """[B] angles -> [B, 3, 3] rotations about x/y/z
    (reference pyrl/utils/torch/ops.py:171 batch_rot_with_axis)."""
    c, s = jnp.cos(angle), jnp.sin(angle)
    z = jnp.zeros_like(c)
    o = jnp.ones_like(c)
    if axis == 2:  # z
        rows = [c, -s, z, s, c, z, z, z, o]
    elif axis == 1:  # y
        rows = [c, z, s, z, o, z, -s, z, c]
    else:  # x
        rows = [o, z, z, z, c, -s, z, s, c]
    return jnp.stack(rows, axis=-1).reshape(angle.shape[0], 3, 3)


@AUGMENTATIONS.register_module()
class GlobalRotScaleTrans(BaseAugmentation):
    """Global rotation/scale/translation of the scene (pcd_aug.py:126-227).

    One 4x4 matrix per batch element, shared by all req_keys; "vel" keys are
    rotated+scaled but not translated; 2D keys use the top-left 2x2 block.
    """

    def __init__(
        self,
        main_key="xyz",
        req_keys=("xyz",),
        rot_range=(-0.78539816, 0.78539816),
        rot_axis="z",
        scale_ratio_range=(0.95, 1.05),
        translation_range=(0, 0, 0),
        shift_height=False,
    ):
        super().__init__(main_key, req_keys)
        if rot_range is not None and not isinstance(rot_range, (list, tuple, np.ndarray)):
            rot_range = [-rot_range, rot_range]
        self.rot_range = rot_range
        self.rot_axis = (ord(rot_axis) - ord("x")) if isinstance(rot_axis, str) else int(rot_axis)
        self.scale_ratio_range = scale_ratio_range
        self.translation_range = None if translation_range is None else np.asarray(translation_range, np.float32)
        self.shift_height = shift_height

    def sample_info(self, rng, main_data):
        B = main_data.shape[0]
        k_rot, k_scale, k_trans = jax.random.split(rng, 3)
        # rot stays None for translation-only configs (the DMC/manipulation
        # "shift" augs): a batched [B, 3, 3] @ [B, 3, N] einsum of tiny
        # matrices maps terribly onto the MXU — skipping the identity matmul
        # measured 87.7 -> ~128 DrQ updates/s on v5e at walker shapes.
        rot = None
        if self.rot_range is not None:
            angle = jax.random.uniform(k_rot, (B,), minval=self.rot_range[0], maxval=self.rot_range[1])
            rot = rot_matrix_about_axis(angle, self.rot_axis)
        if self.scale_ratio_range is not None:
            # Reference samples a [B, 3, 1] scale: independent per-ROW scale
            # of the rotation matrix (anisotropic after rotation).
            scale = jax.random.uniform(
                k_scale, (B, 3, 1), minval=self.scale_ratio_range[0], maxval=self.scale_ratio_range[1]
            )
            base = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (B, 3, 3)) if rot is None else rot
            rot = base * scale
        if self.translation_range is not None:
            delta = (jax.random.uniform(k_trans, (B, 3)) - 0.5) * 2.0 * jnp.asarray(self.translation_range)
            if not self.shift_height:
                delta = delta.at[..., 2].set(0.0)
        else:
            delta = jnp.zeros((B, 3), jnp.float32)
        return rot, delta

    def apply_single(self, data, key, info, rng):
        rot, delta = info
        is_vel = "vel" in (key or "")
        dims = data.shape[-2] if data.ndim == 3 else data.shape[-1]
        t = delta[..., :dims]
        x = jnp.asarray(data, jnp.float32)
        if x.ndim == 3:  # [B, C, N]
            if rot is not None:
                x = jnp.einsum("bji,bin->bjn", rot[..., :dims, :dims], x)
            if not is_vel and self.translation_range is not None:
                x = x + t[..., None]
        else:  # [B, C]
            if rot is not None:
                x = jnp.einsum("bji,bi->bj", rot[..., :dims, :dims], x)
            if not is_vel and self.translation_range is not None:
                x = x + t
        return x.astype(data.dtype) if jnp.issubdtype(data.dtype, jnp.floating) else x


@AUGMENTATIONS.register_module()
class RandomJitterPoints(BaseAugmentation):
    """Per-point uniform coordinate noise (pcd_aug.py:307-327)."""

    def __init__(self, main_key="xyz", req_keys=None, jitter_range=(-0.1, 0.1)):
        super().__init__(main_key, req_keys)
        self.jitter_range = jitter_range

    def apply_single(self, data, key, info, rng):
        noise = jax.random.uniform(rng, data.shape, jnp.float32, self.jitter_range[0], self.jitter_range[1])
        return data + noise.astype(data.dtype)


@AUGMENTATIONS.register_module()
class RandomDownSample(BaseAugmentation):
    """Drop a fixed ratio of points with one shared permutation
    (pcd_aug.py:232-267: the same point index subset for the whole batch)."""

    def __init__(self, main_key="xyz", req_keys=("xyz",), max_num_points=None, drop_ratio=None, fixed_ratio=True):
        super().__init__(main_key, req_keys)
        assert (drop_ratio is None) != (max_num_points is None)
        self.max_num_points = max_num_points
        self.drop_ratio = drop_ratio
        self.fixed_ratio = fixed_ratio

    def sample_info(self, rng, main_data):
        N = main_data.shape[-1]
        k_perm, k_count = jax.random.split(rng)
        perm = jax.random.permutation(k_perm, N)
        if self.drop_ratio is not None:
            min_keep = N - int(N * self.drop_ratio)
        else:
            min_keep = min(self.max_num_points, N)
        if self.fixed_ratio:
            # Static shrink: slice to the fixed keep count.
            return perm[:min_keep], None
        # fixed_ratio=False: the reference drops a RANDOM count (dynamic
        # shape).  Under jit we keep N static and pad with duplicates of the
        # kept points instead (pad-by-tiling, like the env samplers): for
        # max-pool encoders this is exactly equivalent to dropping.
        keep = jax.random.randint(k_count, (), min_keep, N + 1)
        pos = jnp.arange(N)
        remapped = jnp.where(pos < keep, perm, jnp.take(perm, pos % jnp.maximum(keep, 1)))
        return remapped, keep

    def apply_single(self, data, key, info, rng):
        index, _ = info
        return jnp.take(data, index, axis=-1)


@AUGMENTATIONS.register_module()
class RandomDownSampleAndFilter(BaseAugmentation):
    """Segmentation-aware random downsample with a per-frame foreground
    budget.

    Parity target: the reference registers this only in
    ``configs/mfrl/drq/dm_control/pn_sample.py`` (n_points=512, n_fg=292,
    stack_frame=3) — the implementation is ABSENT from the reference
    snapshot (SURVEY.md §2.3), so that config cannot run there.  Semantics
    here follow the env-side budget split the reference DOES ship
    (dm_control_utils.py:365-381 ``sample_and_pad`` over body/ground
    masks), lifted into the jitted update: per stacked frame, sample
    ``n_fg`` points where ``filter_seg`` is true and ``n_points - n_fg``
    from the rest, pad-by-tiling when a side is short, zero-fill when a
    side is empty, and gather the SAME indices from every requested key.

    func_keys/func_key_map (reference config contract): the keys the
    selection function reads, mapped to canonical names — e.g.
    ``"filter_seg" -> "seg"`` via ``lambda _: _.split("_")[-1]``.  The key
    mapping to ``"seg"`` provides the foreground mask; it is downsampled
    along with the req_keys so the dict stays shape-consistent.
    """

    def __init__(self, main_key="xyz", req_keys=("xyz", "rgb", "pos_encoding"),
                 func_keys=("xyz", "filter_seg"), func_key_map='lambda _: _.split("_")[-1]',
                 n_points=512, n_fg=292, stack_frame=1):
        super().__init__(main_key, req_keys)
        self.n_points = int(n_points)
        self.n_fg = int(n_fg)
        assert 0 <= self.n_fg <= self.n_points
        self.stack_frame = int(stack_frame)
        key_map = eval(func_key_map) if isinstance(func_key_map, str) else (func_key_map or (lambda k: k))
        self.seg_key = next((k for k in func_keys if key_map(k) == "seg"), "seg")

    def _frame_indices(self, rng, seg):
        """seg: [B, Nf] bool for ONE frame -> [B, n_points] indices into Nf.
        Foreground picks first (n_fg), then the rest (n_points - n_fg)."""
        B, Nf = seg.shape
        scores = jax.random.uniform(rng, (B, Nf))

        def _side(mask, count):
            # Sort so masked points come first in random order; positions
            # beyond the available count wrap (pad-by-tiling, like the
            # reference's sample_and_pad).
            order = jnp.argsort(jnp.where(mask, scores, scores + 2.0), axis=-1)
            avail = mask.sum(axis=-1, keepdims=True)  # [B, 1]
            pos = jnp.arange(count)[None, :]
            pos = jnp.where(pos < avail, pos, pos % jnp.maximum(avail, 1))
            idx = jnp.take_along_axis(order, pos, axis=-1)  # [B, count]
            valid = (avail > 0)  # [B, 1] zero-fill marker for the empty side
            return idx, valid

        fg_idx, fg_valid = _side(seg, self.n_fg)
        bg_idx, bg_valid = _side(~seg, self.n_points - self.n_fg)
        idx = jnp.concatenate([fg_idx, bg_idx], axis=-1)
        valid = jnp.concatenate(
            [jnp.broadcast_to(fg_valid, fg_idx.shape), jnp.broadcast_to(bg_valid, bg_idx.shape)],
            axis=-1,
        )
        return idx, valid

    def sample_info(self, rng, main_data):
        return None  # selection needs the seg key; done in __call__

    def __call__(self, rng, data):
        data = _shallow_copy(data)
        seg = path_get(data, self.seg_key)
        assert seg is not None, f"RandomDownSampleAndFilter: missing '{self.seg_key}' in obs"
        seg = jnp.asarray(seg)
        if seg.ndim == 3:  # channel-first [B, 1, N]
            seg = seg[:, 0, :]
        seg = seg.astype(bool)
        N = seg.shape[-1]
        assert N % self.stack_frame == 0, (N, self.stack_frame)
        Nf = N // self.stack_frame
        assert self.n_points <= Nf, f"n_points {self.n_points} > frame size {Nf}"

        idx_frames, valid_frames = [], []
        for f in range(self.stack_frame):  # static unroll
            idx_f, valid_f = self._frame_indices(
                jax.random.fold_in(rng, f), seg[..., f * Nf:(f + 1) * Nf]
            )
            idx_frames.append(idx_f + f * Nf)
            valid_frames.append(valid_f)
        index = jnp.concatenate(idx_frames, axis=-1)  # [B, stack * n_points]
        valid = jnp.concatenate(valid_frames, axis=-1)

        for key in list(self.req_keys) + [self.seg_key]:
            item = path_get(data, key)
            if item is None:
                continue
            x = jnp.asarray(item)
            picked = jnp.take_along_axis(x, index[:, None, :], axis=-1)  # [B, C, stack*n_points]
            if key in ("xyz", "rgb"):  # reference zero-fills an empty side's values
                picked = picked * valid[:, None, :].astype(picked.dtype)
            path_set(data, key, picked)
        return data


@AUGMENTATIONS.register_module()
class ColorJitterPoints(BaseAugmentation):
    """Brightness/contrast/saturation/hue jitter on [B, 3, N] uint8 colors
    (pcd_aug.py:270-303).  torchvision samples ONE factor per call applied to
    the whole batch; we match that."""

    def __init__(self, main_key="rgb", req_keys=("rgb",), brightness=0.5, contrast=0.5, saturation=0.5, hue=0.5):
        super().__init__(main_key, req_keys)
        self.brightness, self.contrast, self.saturation, self.hue = brightness, contrast, saturation, hue

    def sample_info(self, rng, main_data):
        kb, kc, ks, kh, kp = jax.random.split(rng, 5)
        b = jax.random.uniform(kb, (), minval=max(0.0, 1 - self.brightness), maxval=1 + self.brightness)
        c = jax.random.uniform(kc, (), minval=max(0.0, 1 - self.contrast), maxval=1 + self.contrast)
        s = jax.random.uniform(ks, (), minval=max(0.0, 1 - self.saturation), maxval=1 + self.saturation)
        h = jax.random.uniform(kh, (), minval=-self.hue, maxval=self.hue)
        order = jax.random.permutation(kp, 4)
        return b, c, s, h, order

    def apply_single(self, data, key, info, rng):
        b, c, s, h, order = info
        orig_dtype = data.dtype
        x = data.astype(jnp.float32) / 255.0 if orig_dtype == jnp.uint8 else data.astype(jnp.float32)
        # x: [B, 3, N] in [0, 1]
        r, g, bl = x[:, 0], x[:, 1], x[:, 2]

        def _brightness(x):
            return jnp.clip(x * b, 0.0, 1.0)

        def _contrast(x):
            # torchvision: blend with mean of grayscale
            gray = 0.2989 * x[:, 0] + 0.587 * x[:, 1] + 0.114 * x[:, 2]
            mean = gray.mean(axis=-1, keepdims=True)[:, None]
            return jnp.clip(x * c + (1 - c) * mean, 0.0, 1.0)

        def _saturation(x):
            gray = (0.2989 * x[:, 0] + 0.587 * x[:, 1] + 0.114 * x[:, 2])[:, None]
            return jnp.clip(x * s + (1 - s) * gray, 0.0, 1.0)

        def _hue(x):
            # RGB -> HSV hue shift -> RGB (approximate via YIQ rotation,
            # numerically close to torchvision for small hue offsets)
            theta = 2 * jnp.pi * h
            cos_t, sin_t = jnp.cos(theta), jnp.sin(theta)
            tyiq = jnp.array([[0.299, 0.587, 0.114], [0.596, -0.274, -0.321], [0.211, -0.523, 0.311]])
            ityiq = jnp.array([[1.0, 0.956, 0.621], [1.0, -0.272, -0.647], [1.0, -1.107, 1.705]])
            rot = jnp.array([[1, 0, 0], [0, cos_t, -sin_t], [0, sin_t, cos_t]])
            m = ityiq @ rot @ tyiq
            return jnp.clip(jnp.einsum("ij,bjn->bin", m, x), 0.0, 1.0)

        fns = [_brightness, _contrast, _saturation, _hue]
        for idx in range(4):
            x = jax.lax.switch(order[idx], fns, x)
        if orig_dtype == jnp.uint8:
            return (x * 255.0 + 0.5).astype(jnp.uint8)
        return x.astype(orig_dtype)


@AUGMENTATIONS.register_module()
class AddOriginBall(BaseAugmentation):
    """Append n_pts Gaussian points at the origin (pcd_aug.py:330-359), for
    PushChair's origin-centered target-ball indicator."""

    def __init__(self, main_key="xyz", req_keys=None, n_pts=50, noise_std=0.02):
        super().__init__(main_key, req_keys or [main_key])
        self.n_pts = n_pts
        self.noise_std = noise_std

    def __call__(self, rng, data):
        data = _shallow_copy(data)
        xyz = path_get(data, "xyz")
        B = xyz.shape[0]
        ex_xyz = jax.random.normal(rng, (B, 3, self.n_pts), xyz.dtype) * self.noise_std
        path_set(data, "xyz", jnp.concatenate([xyz, ex_xyz], axis=-1))
        seg = path_get(data, "seg")
        if seg is not None:
            path_set(data, "seg", jnp.concatenate([seg, jnp.zeros(seg.shape[:-1] + (self.n_pts,), seg.dtype)], axis=-1))
        rgb = path_get(data, "rgb")
        if rgb is not None:
            path_set(data, "rgb", jnp.concatenate([rgb, jnp.zeros((B, 3, self.n_pts), rgb.dtype)], axis=-1))
        return data


# ------------------------------------------------------------------ images
@AUGMENTATIONS.register_module()
class ToChannelFirst(BaseAugmentation):
    """[..., H, W, C] -> [..., C, H, W] for every leaf (image_aug.py:123)."""

    def __init__(self, main_key=None, req_keys=None):
        super().__init__(main_key, req_keys)

    def __call__(self, rng, data):
        return jax.tree_util.tree_map(lambda x: jnp.moveaxis(x, -1, -3), _shallow_copy(data))


@AUGMENTATIONS.register_module()
class ToChannelLast(BaseAugmentation):
    """[..., C, H, W] -> [..., H, W, C] for every leaf (image_aug.py:147)."""

    def __init__(self, main_key=None, req_keys=None):
        super().__init__(main_key, req_keys)

    def __call__(self, rng, data):
        return jax.tree_util.tree_map(lambda x: jnp.moveaxis(x, -3, -1), _shallow_copy(data))


@AUGMENTATIONS.register_module()
class RandomChannelSwap(BaseAugmentation):
    """Randomly permute the per-image rgb channel order with probability
    ``prob`` (image_aug.py torch_imsign-based channel swaps): one draw per
    batch element, optionally independent per stacked frame."""

    def __init__(self, main_key="rgb", req_keys=("rgb",), prob=0.5, independent=False):
        super().__init__(main_key, req_keys)
        self.prob = prob
        self.independent = independent

    def apply_single(self, data, key, info, rng):
        # data: [B, 3*K, H, W]
        k_sign, k_perm = jax.random.split(rng)
        B = data.shape[0]
        num_images = data.shape[-3] // 3
        x = data.reshape(B, num_images, 3, *data.shape[-2:])
        n_draw = num_images if self.independent else 1
        do = jax.random.uniform(k_sign, (B, n_draw)) <= self.prob
        do = jnp.repeat(do, num_images // n_draw, axis=1)  # [B, num_images]
        perm = jax.random.permutation(k_perm, 3)
        swapped = x[:, :, perm]
        out = jnp.where(do[:, :, None, None, None], swapped, x)
        return out.reshape(data.shape)


@AUGMENTATIONS.register_module()
class RandomCrop(BaseAugmentation):
    """Pad-and-random-crop (DrQ shift aug), per-batch-element offsets
    (image_aug.py:12-92)."""

    def __init__(self, main_key="rgb", req_keys=("rgb",), size=None, padding=None,
                 pad_if_needed=False, pad_val=0, padding_mode="constant", use_kornia=False):
        super().__init__(main_key, req_keys)
        self.size = (size, size) if isinstance(size, (int, float)) else tuple(size)
        self.padding = padding
        self.pad_val = pad_val
        self.padding_mode = padding_mode
        self.pad_if_needed = pad_if_needed

    def _pad(self, x):
        if self.padding is None:
            return x
        p = self.padding
        if isinstance(p, int):
            pads = (p, p, p, p)  # l, t, r, b
        elif len(p) == 2:
            pads = (p[0], p[1], p[0], p[1])
        else:
            pads = tuple(p)
        l, t, r, b = pads
        mode = {"constant": "constant", "reflect": "reflect", "edge": "edge", "symmetric": "symmetric"}[self.padding_mode]
        cfg = [(0, 0)] * (x.ndim - 2) + [(t, b), (l, r)]
        if mode == "constant":
            return jnp.pad(x, cfg, mode="constant", constant_values=self.pad_val)
        return jnp.pad(x, cfg, mode=mode)

    def sample_info(self, rng, main_data):
        x = self._pad(main_data)
        th, tw = self.size
        h, w = x.shape[-2:]
        batch_shape = main_data.shape[:-3]
        ki, kj = jax.random.split(rng)
        i = jax.random.randint(ki, batch_shape, 0, h - th + 1)
        j = jax.random.randint(kj, batch_shape, 0, w - tw + 1)
        return i, j

    def apply_single(self, data, key, info, rng):
        i, j = info
        x = self._pad(data)
        th, tw = self.size
        lead = x.shape[:-3]
        flat = x.reshape((-1,) + x.shape[-3:])
        fi = i.reshape(-1)
        fj = j.reshape(-1)

        def crop_one(img, ii, jj):
            return jax.lax.dynamic_slice(img, (0, ii, jj), (img.shape[0], th, tw))

        out = jax.vmap(crop_one)(flat, fi, fj)
        return out.reshape(lead + out.shape[-3:])
