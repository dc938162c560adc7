"""Range-image projection (imageProjection node equivalent).

Behavioral parity target (re-designed as dense scatter ops):
  reference `src/jueying_slam/src/imageProjection.cpp`
  - `projectPointCloud` (:736-797): N_SCAN x Horizon_SCAN range image,
    row from ring index (or synthesized from elevation for ringless lidars,
    :325-461), column from the horizontal angle,
  - `cloudExtraction` (:799-824): per-ring start/end indices + column index
    + range arrays handed to feature extraction (the cloud_info contract,
    msg/cloud_info.msg).

Deskew (`deskewPoint` :704-733) is served by the shared
`models.lio.imu.undistort` on the raw cloud before projection.

TPU design: the image is a dense (n_scan, horizon) array — scatter-min for
range, winner-takes-cell for payload. All downstream feature ops are dense
stencils over this image; the ragged per-ring extraction of the reference is
unnecessary (masks carry validity).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

_INF = 3.0e38


@dataclasses.dataclass(frozen=True)
class ProjectionConfig:
    n_scan: int = 16                 # N_SCAN (utility.h)
    horizon: int = 1800              # Horizon_SCAN
    fov_up_deg: float = 15.0         # used when no ring channel
    fov_down_deg: float = -15.0
    min_range: float = 1.0           # lidarMinRange
    max_range: float = 1000.0        # lidarMaxRange


class RangeImage(NamedTuple):
    rng: jnp.ndarray    # (n_scan, horizon) range, +inf where empty
    x: jnp.ndarray      # (n_scan, horizon) point coords
    y: jnp.ndarray
    z: jnp.ndarray
    valid: jnp.ndarray  # bool (n_scan, horizon)
    col: jnp.ndarray    # column of each input point (N,), -1 invalid
    row: jnp.ndarray    # row of each input point (N,)


def rows_from_elevation(cfg: ProjectionConfig, points: jnp.ndarray) -> jnp.ndarray:
    """Synthesize ring indices from elevation angle (rslidar/velodyne paths,
    imageProjection.cpp:325-461)."""
    r_xy = jnp.sqrt(points[0] ** 2 + points[1] ** 2)
    elev = jnp.degrees(jnp.arctan2(points[2], r_xy))
    step = (cfg.fov_up_deg - cfg.fov_down_deg) / max(cfg.n_scan - 1, 1)
    return jnp.round((elev - cfg.fov_down_deg) / step).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("cfg",))
def project(cfg: ProjectionConfig, points: jnp.ndarray, mask: jnp.ndarray, rows=None) -> RangeImage:
    """points (3, N) sensor frame -> dense range image."""
    H, S = cfg.horizon, cfg.n_scan
    r = jnp.sqrt(jnp.sum(points * points, axis=0))
    if rows is None:
        rows = rows_from_elevation(cfg, points)
    ang = jnp.arctan2(points[1], points[0])  # [-pi, pi]
    col = jnp.floor((jnp.pi - ang) / (2.0 * jnp.pi) * H).astype(jnp.int32) % H
    ok = mask & (r >= cfg.min_range) & (r <= cfg.max_range) & (rows >= 0) & (rows < S)
    flat = jnp.where(ok, rows * H + col, S * H)

    img = jnp.full((S * H,), _INF, points.dtype).at[flat].min(r, mode="drop")
    # winner-takes-cell payload scatter
    win = ok & (img[jnp.minimum(flat, S * H - 1)] == r)
    wflat = jnp.where(win, flat, S * H)
    px = jnp.zeros((S * H,), points.dtype).at[wflat].set(points[0], mode="drop")
    py = jnp.zeros((S * H,), points.dtype).at[wflat].set(points[1], mode="drop")
    pz = jnp.zeros((S * H,), points.dtype).at[wflat].set(points[2], mode="drop")
    valid = (img < _INF).reshape(S, H)
    return RangeImage(
        rng=img.reshape(S, H),
        x=px.reshape(S, H),
        y=py.reshape(S, H),
        z=pz.reshape(S, H),
        valid=valid,
        col=jnp.where(ok, col, -1),
        row=rows,
    )
