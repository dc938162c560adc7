"""Pallas TPU kernels (hot-path custom kernels; pure-XLA fallbacks exist)."""

from .bf_knn import knn, nearest_neighbor, pad_cloud

__all__ = ["knn", "nearest_neighbor", "pad_cloud"]
