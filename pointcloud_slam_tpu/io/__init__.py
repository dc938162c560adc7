"""Host-side IO: synthetic data, PCD files, rosbags, sensor feeds."""

from . import feed, pcd, rosbag, synthetic

__all__ = ["feed", "pcd", "rosbag", "synthetic"]
