"""Host-side IO: synthetic data, PCD files, sensor feeds."""

from . import synthetic

__all__ = ["synthetic"]
