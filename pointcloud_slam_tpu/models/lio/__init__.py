"""Faster-LIO style tightly-coupled lidar-inertial odometry (flagship model)."""

from . import eskf, imu, pipeline, state
from .pipeline import LIOConfig, LIOFrame, LIOOutput, LIOState, create_state, lio_step, reset

__all__ = [
    "state",
    "eskf",
    "imu",
    "pipeline",
    "LIOConfig",
    "LIOFrame",
    "LIOState",
    "LIOOutput",
    "create_state",
    "lio_step",
    "reset",
]
