"""pointcloud_rl_tpu — TPU-native point-cloud reinforcement learning.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
lz1oceani/pointcloud_rl: config-driven SAC/DrQ training from point-cloud,
RGB-D, and state observations, with PointNet / voxel-CNN / 2D-CNN encoders,
multiprocess env workers on the host, and data-parallel training over a
`jax.sharding.Mesh`.
"""

from .config import Config, ConfigDict, DictAction
from .registry import Registry, build_from_cfg
from .version import __version__

__all__ = ["Config", "ConfigDict", "DictAction", "Registry", "build_from_cfg", "__version__"]
