"""Host-side IO: synthetic data, PCD files, sensor feeds."""

from . import feed, pcd, synthetic

__all__ = ["feed", "pcd", "synthetic"]
