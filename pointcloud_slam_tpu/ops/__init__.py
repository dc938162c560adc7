"""Core data-structure ops: voxel-hash map, downsampling, masked reductions."""

from . import gaussian_grid
from .downsample import compact, random_decimate, voxel_downsample
from .gaussian_grid import GaussianVoxelMap
from .voxel_grid import (
    GridConfig, VoxelHashMap, create, insert, knn, knn_table, lookup, num_voxels,
    point_to_voxel, stencil_offsets,
)

__all__ = [
    "gaussian_grid",
    "GaussianVoxelMap",
    "GridConfig",
    "VoxelHashMap",
    "create",
    "insert",
    "knn",
    "knn_table",
    "lookup",
    "num_voxels",
    "point_to_voxel",
    "stencil_offsets",
    "voxel_downsample",
    "random_decimate",
    "compact",
]
