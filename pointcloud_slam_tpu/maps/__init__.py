"""Map products: 2-D occupancy grids, 3-D occupancy volumes, nav clouds."""

from . import occupancy, pcd2map
from .occupancy import OccupancyConfig, OccupancyGrid
from .pcd2map import OccupancyVolume, VolumeConfig

__all__ = [
    "occupancy",
    "pcd2map",
    "OccupancyConfig",
    "OccupancyGrid",
    "VolumeConfig",
    "OccupancyVolume",
]
