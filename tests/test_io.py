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
