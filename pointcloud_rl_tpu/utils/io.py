"""File I/O: format-dispatched (de)serialization, tree<->HDF5, compression.

Covers the reference's pyrl/utils/file core (serialization handlers,
hdf5_utils GDict serialization, compression.py DataCoder): load/dump by
extension, nested-tree HDF5 round trips, and replay-oriented codecs
(float16 quantization, PNG-encoded rgb via cv2).
"""

from __future__ import annotations

import csv
import json
import os
import os.path as osp
import pickle
from typing import Any, Dict, List, Optional

import numpy as np


# ------------------------------------------------------------- serialization
def load(path: str, **kwargs) -> Any:
    ext = osp.splitext(path)[1].lower()
    if ext in (".pkl", ".pickle"):
        with open(path, "rb") as f:
            return pickle.load(f)
    if ext == ".json":
        with open(path) as f:
            return json.load(f)
    if ext in (".yml", ".yaml"):
        import yaml

        with open(path) as f:
            return yaml.safe_load(f)
    if ext == ".csv":
        with open(path, newline="") as f:
            return list(csv.DictReader(f))
    if ext == ".txt":
        with open(path) as f:
            return f.read()
    if ext == ".npy":
        return np.load(path, allow_pickle=False)
    if ext in (".h5", ".hdf5"):
        return load_hdf5(path)
    raise KeyError(f"Unsupported extension {ext}")


def dump(obj: Any, path: str, **kwargs) -> None:
    os.makedirs(osp.dirname(osp.abspath(path)), exist_ok=True)
    ext = osp.splitext(path)[1].lower()
    if ext in (".pkl", ".pickle"):
        with open(path, "wb") as f:
            pickle.dump(obj, f)
    elif ext == ".json":
        with open(path, "w") as f:
            json.dump(obj, f, indent=2, default=str)
    elif ext in (".yml", ".yaml"):
        import yaml

        with open(path, "w") as f:
            yaml.safe_dump(obj, f)
    elif ext == ".csv":
        assert isinstance(obj, (list, tuple)) and obj and isinstance(obj[0], dict)
        with open(path, "w", newline="") as f:
            writer = csv.DictWriter(f, fieldnames=list(obj[0]))
            writer.writeheader()
            writer.writerows(obj)
    elif ext == ".txt":
        with open(path, "w") as f:
            f.write(str(obj))
    elif ext == ".npy":
        np.save(path, obj)
    elif ext in (".h5", ".hdf5"):
        dump_hdf5(obj, path)
    else:
        raise KeyError(f"Unsupported extension {ext}")


# -------------------------------------------------------------------- hdf5
def dump_hdf5(tree, path: str, compression: Optional[str] = "gzip") -> None:
    import h5py

    with h5py.File(path, "w") as f:

        def _walk(group, node):
            for k, v in node.items():
                if isinstance(v, dict):
                    _walk(group.create_group(str(k)), v)
                else:
                    arr = np.asarray(v)
                    kwargs = {"compression": compression} if (compression and arr.ndim > 0) else {}
                    group.create_dataset(str(k), data=arr, **kwargs)

        _walk(f, tree if isinstance(tree, dict) else {"data": tree})


def load_hdf5(path: str):
    import h5py

    with h5py.File(path, "r") as f:

        def _walk(group):
            return {k: (_walk(v) if hasattr(v, "items") else np.asarray(v)) for k, v in group.items()}

        out = _walk(f)
    return out["data"] if list(out) == ["data"] else out


# -------------------------------------------------------------- compression
class DataCoder:
    """Replay/trajectory codecs (reference compression.py role):

    * float32 -> float16 quantization for xyz/depth-like channels
    * uint8 rgb image (en/de)coding as PNG bytes via cv2
    """

    def __init__(self, f16: bool = True, png_keys: tuple = ("rgb",)):
        self.f16 = f16
        self.png_keys = png_keys

    def encode(self, tree):
        from .tree_ops import tree_map

        def _enc(x):
            x = np.asarray(x)
            if self.f16 and x.dtype == np.float32:
                return x.astype(np.float16)
            return x

        return tree_map(_enc, tree)

    def decode(self, tree):
        from .tree_ops import tree_map

        def _dec(x):
            x = np.asarray(x)
            if x.dtype == np.float16:
                return x.astype(np.float32)
            return x

        return tree_map(_dec, tree)

    @staticmethod
    def encode_png(img: np.ndarray) -> bytes:
        import cv2

        ok, buf = cv2.imencode(".png", img)
        assert ok
        return buf.tobytes()

    @staticmethod
    def decode_png(data: bytes) -> np.ndarray:
        import cv2

        return cv2.imdecode(np.frombuffer(data, np.uint8), cv2.IMREAD_UNCHANGED)


# --------------------------------------------------------------- file cache
class FileCache:
    """Background prefetcher for trajectory files (reference cache_utils.py
    role, thread-based): keeps up to ``ahead`` decoded files ready while the
    consumer trains — used when the replay capacity is smaller than the
    dataset and files are streamed in shards."""

    def __init__(self, filenames: List[str], loader=load, ahead: int = 2, loop: bool = True):
        import queue
        import threading

        self.filenames = list(filenames)
        self.loader = loader
        self.loop = loop
        self._q: "queue.Queue" = queue.Queue(maxsize=max(ahead, 1))
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _run(self):
        i = 0
        while not self._stop.is_set() and (self.loop or i < len(self.filenames)):
            path = self.filenames[i % len(self.filenames)]
            try:
                data = self.loader(path)
            except Exception as e:  # surface loader failures to the consumer
                data = e
            while not self._stop.is_set():
                try:
                    self._q.put((path, data), timeout=0.2)
                    break
                except Exception:
                    continue
            i += 1
        self._q.put((None, None))

    def get(self, timeout: Optional[float] = 60.0):
        """(path, data) of the next prefetched file; raises loader errors."""
        path, data = self._q.get(timeout=timeout)
        if isinstance(data, Exception):
            raise data
        return path, data

    def close(self):
        self._stop.set()
        try:
            while True:
                self._q.get_nowait()
        except Exception:
            pass
