from .augment import AUGMENTATIONS, DataAugmentations, build_data_augmentations
from .camera import depth_to_camera_xyz, fuse_camera_pointclouds, transform_points
from .masked import masked_average, masked_max
from .pointnet_fused import fused_pointnet_body
from .sampling import seg_balanced_downsample, uniform_downsample
from .sparse_conv import sparse_conv_layer
from .voxelize import voxelize_dense, voxelize_sparse

__all__ = [
    "AUGMENTATIONS",
    "DataAugmentations",
    "build_data_augmentations",
    "depth_to_camera_xyz",
    "fuse_camera_pointclouds",
    "transform_points",
    "masked_average",
    "masked_max",
    "fused_pointnet_body",
    "seg_balanced_downsample",
    "uniform_downsample",
    "sparse_conv_layer",
    "voxelize_dense",
    "voxelize_sparse",
]
