"""SLAM model families: LIO odometry, LIO-SAM pose-graph SLAM, localization."""

from . import lio

__all__ = ["lio"]
