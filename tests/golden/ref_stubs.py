"""Import machinery to load the reference pyrl (torch) with its unavailable
deps stubbed.  Used ONLY by golden-parity tests: the reference is the
oracle, run on torch-CPU."""

import sys
import types
from unittest import mock


class AddictDict(dict):
    """Minimal attr-dict standing in for addict.Dict (reference Config base)."""

    def __init__(self, *args, **kwargs):
        super().__init__()
        for src in args + (kwargs,):
            if src:
                for k, v in dict(src).items():
                    self[k] = v

    @classmethod
    def _hook(cls, v):
        if isinstance(v, dict) and not isinstance(v, AddictDict):
            return cls(v)
        if isinstance(v, (list, tuple)):
            return type(v)(cls._hook(x) for x in v)
        return v

    def __setattr__(self, k, v):
        self[k] = v

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError:
            raise AttributeError(k)

    def __setitem__(self, k, v):
        super().__setitem__(k, self._hook(v))


def install_stubs():
    if "addict" not in sys.modules:
        addict = types.ModuleType("addict")
        addict.Dict = AddictDict
        sys.modules["addict"] = addict
    if "yapf" not in sys.modules:
        yapf = types.ModuleType("yapf")
        yapf.__path__ = []
        yapflib = types.ModuleType("yapf.yapflib")
        yapflib.__path__ = []
        yapf_api = types.ModuleType("yapf.yapflib.yapf_api")
        yapf_api.FormatCode = lambda s, **kw: (s, True)
        sys.modules["yapf"] = yapf
        sys.modules["yapf.yapflib"] = yapflib
        sys.modules["yapf.yapflib.yapf_api"] = yapf_api
    # pure-leaf deps the import chain touches but the SAC path never calls:
    # a meta-path finder serves MagicMock modules for these prefixes and any
    # of their submodules, so `import torchvision.transforms.functional_tensor`
    # resolves without enumerating every path.
    prefixes = ("sorcery", "colorlog", "psutil", "lmdb", "cv2", "GPUtil", "git",
                "tabulate", "tqdm", "torchvision", "kornia", "open3d", "bokeh",
                "transforms3d", "torchviz", "aim", "wandb", "imageio")
    available = set()
    for name in prefixes:
        try:
            __import__(name)
            available.add(name)
        except ImportError:
            pass

    import importlib.abc
    import importlib.machinery
    import importlib.util

    class _MockLoader(importlib.abc.Loader):
        def create_module(self, spec):
            mod = mock.MagicMock(name=spec.name)
            mod.__name__ = spec.name
            mod.__path__ = []
            mod.__spec__ = spec
            mod.__loader__ = self
            return mod

        def exec_module(self, module):
            pass

    class _MockFinder(importlib.abc.MetaPathFinder):
        def find_spec(self, fullname, path=None, target=None):
            root = fullname.split(".")[0]
            if root in prefixes and root not in available:
                return importlib.machinery.ModuleSpec(fullname, _MockLoader(), is_package=True)
            return None

    if not any(type(f).__name__ == "_MockFinder" for f in sys.meta_path):
        sys.meta_path.insert(0, _MockFinder())


def _install_gym_alias():
    if "gym" in sys.modules:
        return
    try:
        import gym  # noqa: F401
    except ImportError:
        import gymnasium

        sys.modules["gym"] = gymnasium
        sys.modules["gym.spaces"] = gymnasium.spaces


def load_reference_sac():
    install_stubs()
    _install_gym_alias()
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from pyrl.methods.mfrl.sac import SAC  # noqa: PLC0415

    return SAC
