"""Pallas TPU kernels (hot-path custom kernels; pure-XLA fallbacks exist)."""

from .bf_knn import nearest_neighbor

__all__ = ["nearest_neighbor"]
