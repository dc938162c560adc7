"""SLAM model families: LIO odometry, LIO-SAM pose-graph SLAM, localization."""

from . import lio, liosam, localization

__all__ = ["lio", "liosam", "localization"]
