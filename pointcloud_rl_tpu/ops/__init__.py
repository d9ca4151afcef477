from .masked import masked_average, masked_max
from .voxelize import voxelize_dense, voxelize_sparse

__all__ = ["masked_average", "masked_max", "voxelize_dense", "voxelize_sparse"]
