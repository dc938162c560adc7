"""Lidar preprocessing: per-vendor parsing, blind filter, decimation, time synthesis.

Behavioral parity target:
  reference `src/jueying_lio/src/pointcloud_preprocess.cc`
  - `AviaHandler` (:14-80): Livox CustomMsg tag filter (spatial/intensity tag
    bits 0x30 == 0x10/0x00), line < num_scans, 1/N decimation, blind range,
    time offset in ms stored in `curvature`,
  - `VelodyneHandler` / `RslidarHandler` (:150-305): ring/time synthesis from
    azimuth when the format carries no per-point timestamps
    (omega = 0.361 deg/ms scan rate),
  - blind-range filter (`blind * blind > x^2+y^2+z^2` drop).

Device side: pure mask ops on (3, N) clouds. Host side: numpy field decoding
(the converter layer `io.converters` feeds this)."""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class PreprocessConfig:
    blind: float = 0.1               # blind range [m]
    point_filter_num: int = 1        # keep every n-th point
    max_range: float = 150.0
    num_scans: int = 6               # lidar lines (AVIA 6)


@functools.partial(jax.jit, static_argnames=("cfg",))
def apply_masks(cfg: PreprocessConfig, points: jnp.ndarray, mask: jnp.ndarray):
    """Blind range + max range + 1/N decimation (device side)."""
    d2 = jnp.sum(points * points, axis=0)
    m = mask & (d2 > cfg.blind * cfg.blind) & (d2 < cfg.max_range * cfg.max_range)
    idx = jnp.cumsum(m.astype(jnp.int32)) - 1
    m = m & (idx % cfg.point_filter_num == 0)
    return m


def avia_tag_filter(tags: np.ndarray) -> np.ndarray:
    """Livox tag gating: spatial tag bits (4:5) must be 0x10 or 0x00
    (pointcloud_preprocess.cc:31)."""
    sp = tags & 0x30
    return (sp == 0x10) | (sp == 0x00)


def synthesize_velodyne_times(points_xyz: np.ndarray, rings: np.ndarray, scan_rate_hz: float = 10.0) -> np.ndarray:
    """Relative point time [s] from azimuth when the format has no timestamps
    (VelodyneHandler :150-220: omega scan angular velocity, per-ring unwrap)."""
    yaw = np.degrees(np.arctan2(points_xyz[:, 1], points_xyz[:, 0]))
    omega = 360.0 * scan_rate_hz  # deg/s
    t = np.zeros(len(points_xyz), np.float64)
    for r in np.unique(rings):
        sel = np.where(rings == r)[0]
        if len(sel) == 0:
            continue
        y = yaw[sel]
        y0 = y[0]
        rel = (y0 - y) % 360.0  # clockwise scan
        t[sel] = rel / omega
    return t.astype(np.float32)
