"""Core data-structure ops: voxel-hash map, downsampling, masked reductions."""

from . import gaussian_grid, phc
from .downsample import compact, random_decimate, voxel_downsample, voxel_downsample_compact
from .gaussian_grid import GaussianVoxelMap
from .phc import hilbert_coords, hilbert_index, phc_merge, phc_sort
from .voxel_grid import (
    GridConfig, VoxelHashMap, create, insert, knn, knn_table, lookup, num_voxels,
    point_to_voxel, stencil_offsets,
)

__all__ = [
    "gaussian_grid",
    "phc",
    "hilbert_index",
    "hilbert_coords",
    "phc_merge",
    "phc_sort",
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
    "voxel_downsample_compact",
    "random_decimate",
    "compact",
]
