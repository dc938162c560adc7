"""Faster-LIO style tightly-coupled lidar-inertial odometry (flagship model)."""

from . import eskf, fusion, imu, pipeline, preintegration, preprocess, state
from .pipeline import LIOConfig, LIOFrame, LIOOutput, LIOState, create_state, lio_step, reset

__all__ = [
    "state",
    "fusion",
    "preprocess",
    "preintegration",
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
