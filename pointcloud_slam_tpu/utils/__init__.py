"""Utilities: timing registry, config loading, checkpoint/artifact IO."""

from . import checkpoint, config, timer
from .timer import Timer

__all__ = ["timer", "Timer", "config", "checkpoint"]
