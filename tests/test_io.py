"""File I/O: serialization dispatch, HDF5 trees, codecs, FileCache, shm buffers."""

import numpy as np
import pytest

from pointcloud_rl_tpu.utils.io import DataCoder, FileCache, dump, load
from pointcloud_rl_tpu.utils.shmem import SharedTreeBuffer


def test_dump_load_dispatch(tmp_path):
    obj = {"a": 1, "b": [1, 2, 3]}
    for ext in (".pkl", ".json", ".yaml"):
        p = str(tmp_path / f"x{ext}")
        dump(obj, p)
        assert load(p) == obj
    rows = [{"x": "1", "y": "2"}, {"x": "3", "y": "4"}]
    p = str(tmp_path / "t.csv")
    dump(rows, p)
    assert load(p) == rows
    arr = np.arange(6).reshape(2, 3)
    p = str(tmp_path / "a.npy")
    dump(arr, p)
    np.testing.assert_array_equal(load(p), arr)


def test_hdf5_tree_roundtrip(tmp_path):
    tree = {"obs": {"xyz": np.random.randn(4, 3).astype(np.float32)}, "r": np.ones(4)}
    p = str(tmp_path / "t.h5")
    dump(tree, p)
    out = load(p)
    np.testing.assert_array_equal(out["obs"]["xyz"], tree["obs"]["xyz"])
    np.testing.assert_array_equal(out["r"], tree["r"])


def test_data_coder():
    coder = DataCoder()
    tree = {"xyz": np.random.randn(5, 3).astype(np.float32), "rgb": np.zeros((5, 3), np.uint8)}
    enc = coder.encode(tree)
    assert enc["xyz"].dtype == np.float16 and enc["rgb"].dtype == np.uint8
    dec = coder.decode(enc)
    assert dec["xyz"].dtype == np.float32
    np.testing.assert_allclose(dec["xyz"], tree["xyz"], atol=1e-2)
    img = np.random.randint(0, 255, (8, 8, 3), np.uint8)
    np.testing.assert_array_equal(DataCoder.decode_png(DataCoder.encode_png(img)), img)


def test_file_cache(tmp_path):
    paths = []
    for i in range(3):
        p = str(tmp_path / f"f{i}.json")
        dump({"i": i}, p)
        paths.append(p)
    cache = FileCache(paths, ahead=2, loop=False)
    seen = [cache.get()[1]["i"] for _ in range(3)]
    assert seen == [0, 1, 2]
    cache.close()


def test_shared_tree_buffer_roundtrip():
    example = {"xyz": np.zeros((3, 8), np.float32), "rgb": np.zeros((3, 8), np.uint8)}
    buf = SharedTreeBuffer.create(example, slots=4)
    try:
        item = {"xyz": np.ones((3, 8), np.float32) * 2, "rgb": np.full((3, 8), 7, np.uint8)}
        buf.write(2, item)
        # attach through the meta (same process works identically)
        other = SharedTreeBuffer.attach(buf.meta)
        out = other.read(2)
        np.testing.assert_array_equal(out["xyz"], item["xyz"])
        np.testing.assert_array_equal(out["rgb"], item["rgb"])
        assert other.read(0)["xyz"].sum() == 0
        other.close()
    finally:
        buf.close()


def test_quantization_codecs():
    """float<->int quantization (reference compression.py:9-49): range mode
    maps [lo, hi] affinely over the integer range; resolution mode divides."""
    from pointcloud_rl_tpu.utils.io import float_to_int, int_to_float

    rs = np.random.RandomState(0)
    x = rs.uniform(0, 1, (64, 3)).astype(np.float32)
    q = float_to_int(x, vrange=(0.0, 1.0), dtype="uint8")
    assert q.dtype == np.uint8
    back = int_to_float(q, vrange=(0.0, 1.0))
    np.testing.assert_allclose(back, x, atol=1.0 / 255 + 1e-6)

    xyz = rs.uniform(-2, 2, (100, 3)).astype(np.float32)
    q16 = float_to_int(xyz, vrange=None, res=1e-3, dtype="int16")
    assert q16.dtype == np.int16
    np.testing.assert_allclose(int_to_float(q16, vrange=None, res=1e-3), xyz, atol=1e-3)

    depth = rs.uniform(0, 5, (16, 20)).astype(np.float32)
    d16 = float_to_int(depth, vrange=(0.0, 5.0), dtype="uint16")
    np.testing.assert_allclose(int_to_float(d16, vrange=(0.0, 5.0)), depth, atol=5.0 / 65535 + 1e-6)


def test_png_image_codecs():
    """uint16 depth PNG and bit-packed segmentation PNG round-trip exactly
    (reference compression.py:133-156)."""
    from pointcloud_rl_tpu.utils.io import DataCoder

    rs = np.random.RandomState(1)
    depth = rs.randint(0, 65535, (24, 32), dtype=np.uint16)
    assert np.array_equal(DataCoder.decode_depth_png(DataCoder.encode_depth_png(depth)), depth)

    seg = rs.rand(24, 32, 3) > 0.5
    out = DataCoder.decode_seg_png(DataCoder.encode_seg_png(seg))
    assert out.shape == seg.shape and out.dtype == bool
    np.testing.assert_array_equal(out, seg)

    rgb = rs.randint(0, 255, (24, 32, 3), dtype=np.uint8)
    assert np.array_equal(DataCoder.decode_png(DataCoder.encode_png(rgb)), rgb)


def test_data_coder_quantize_cfg():
    from pointcloud_rl_tpu.utils.io import DataCoder

    coder = DataCoder(f16=False, compress_cfg={"xyz": ("quantize", None, 1e-3, "int16")})
    tree = {"xyz": np.random.RandomState(2).uniform(-1, 1, (10, 3)).astype(np.float32),
            "actions": np.ones((10, 2), np.float32)}
    enc = coder.encode(tree)
    assert enc["xyz"].dtype == np.int16 and enc["actions"].dtype == np.float32
    dec = coder.decode(enc)
    np.testing.assert_allclose(dec["xyz"], tree["xyz"], atol=1e-3)


def test_file_client_backends(tmp_path):
    """FileClient dispatch + registry (reference file_client.py:169): disk
    backend reads bytes/text; lazy-dep backends raise ImportError only at
    construction; custom backends register as decorator."""
    import pytest

    from pointcloud_rl_tpu.utils.file_client import (BaseStorageBackend,
                                                     FileClient)

    # the golden tests install a meta-path finder that serves MagicMock
    # modules for lmdb & co. (tests/golden/ref_stubs.py); the lazy-import
    # gate under test needs the REAL import failure, so park those finders
    # (and any mock modules they produced) for the duration of this test.
    import sys
    from unittest import mock as _mock

    parked = [f for f in sys.meta_path if type(f).__name__ == "_MockFinder"]
    for f in parked:
        sys.meta_path.remove(f)
    parked_mods = {k: sys.modules.pop(k) for k in list(sys.modules)
                   if isinstance(sys.modules[k], _mock.MagicMock)}

    p = tmp_path / "blob.bin"
    p.write_bytes(b"\x00\x01payload")
    fc = FileClient("disk")
    assert fc.get(p) == b"\x00\x01payload"
    (tmp_path / "t.txt").write_text("hello")
    assert fc.get_text(tmp_path / "t.txt") == "hello"

    with pytest.raises(ValueError):
        FileClient("nope")
    # lmdb/pymemcache/ceph are not in this image: the gate must fire at
    # CONSTRUCTION (registry itself stays importable), as in the reference.
    try:
        for name in ("lmdb", "memcached", "ceph"):
            with pytest.raises((ImportError, TypeError)):
                FileClient(name, **({"db_path": str(tmp_path)} if name == "lmdb" else {}))
    finally:
        sys.meta_path[:0] = parked
        sys.modules.update(parked_mods)

    @FileClient.register_backend("rot13")
    class Rot13Backend(BaseStorageBackend):
        def get(self, filepath):
            return self.get_text(filepath).encode()

        def get_text(self, filepath):
            import codecs
            with open(filepath) as f:
                return codecs.encode(f.read(), "rot13")

    assert FileClient("rot13").get_text(tmp_path / "t.txt") == "uryyb"
    with pytest.raises(KeyError):
        FileClient.register_backend("rot13", Rot13Backend)


def test_bfloat16_replay_snapshot_roundtrip(tmp_path):
    """Regression (round 5): a pack_features DeviceReplayMemory stores bf16;
    h5py has no bfloat16, so the snapshot writer must tag-and-view (uint16 +
    pcrl_dtype attr) and both loaders must view back — the untagged writer
    produced opaque ``|V2`` datasets that TypeError'd every chain resume
    (items['next_obs']['pcd'] uninterpretable by jit)."""
    import h5py
    import ml_dtypes
    import numpy as np

    from pointcloud_rl_tpu.env.device_replay import DeviceReplayMemory
    from pointcloud_rl_tpu.env.replay import ReplayMemory, h5_read

    def raw(n):
        pe = np.tile(np.eye(3, dtype=np.float32)[:, :, None], (1, 1, 8)).reshape(3, 24)
        return {
            "obs": {"xyz": np.random.randn(n, 3, 24).astype(np.float32),
                    "rgb": (np.random.rand(n, 3, 24) * 255).astype(np.uint8),
                    "pos_encoding": np.repeat(pe[None], n, 0)},
            "next_obs": {"xyz": np.random.randn(n, 3, 24).astype(np.float32),
                         "rgb": (np.random.rand(n, 3, 24) * 255).astype(np.uint8),
                         "pos_encoding": np.repeat(pe[None], n, 0)},
            "actions": np.zeros((n, 2), np.float32),
            "rewards": np.zeros((n, 1), np.float32),
            "dones": np.zeros((n, 1), bool),
            "episode_dones": np.zeros((n, 1), bool),
        }

    mem = DeviceReplayMemory(capacity=32, seed=0, transfer_cfg=dict(pack_features=True))
    mem.push_batch(raw(16))
    # the exact snapshot path train_rl uses: host ReplayMemory over tail()
    snap = ReplayMemory(capacity=16)
    snap.push_batch(mem.tail(16))
    path = str(tmp_path / "replay_latest.h5")
    snap.to_hdf5(path, compression="lzf")

    with h5py.File(path, "r") as f:
        ds = f["obs/pcd"]
        assert ds.dtype == np.uint16 and ds.attrs["pcrl_dtype"] == "bfloat16"

    # restore into a fresh buffer, then keep pushing RAW env transitions
    fresh = DeviceReplayMemory(capacity=32, seed=1, transfer_cfg=dict(pack_features=True))
    fresh.load_hdf5(path)
    assert len(fresh) == 16
    fresh.push_batch(raw(8))
    s = fresh.sample(8)
    pcd = np.asarray(s["obs"]["pcd"], np.float32)
    assert np.isfinite(pcd).all()

    # host loader round-trip too
    host = ReplayMemory(capacity=16)
    host.load_hdf5(path)
    assert np.asarray(host.get_all()["obs"]["pcd"]).dtype == ml_dtypes.bfloat16

    # legacy snapshots (pre-tag): opaque |V2 datasets must read as bf16
    legacy = str(tmp_path / "legacy.h5")
    bits = np.asarray(mem.tail(4)["obs"]["pcd"]).view(np.void(2).dtype)
    with h5py.File(legacy, "w") as f:
        f.create_dataset("obs/pcd", data=bits)
    with h5py.File(legacy, "r") as f:
        back = h5_read(f["obs/pcd"])
    assert back.dtype == ml_dtypes.bfloat16
    assert np.isfinite(np.asarray(back, np.float32)).all()
