"""LOAM feature extraction over the dense range image.

Behavioral parity target (re-designed as dense stencil ops):
  reference `src/jueying_slam/src/featureExtraction.cpp`
  - `calculateSmoothness` (:84-105): curvature = (sum of ±5 range neighbors
    - 10 r)^2,
  - `markOccludedPoints` (:107-145): occlusion (adjacent column range jump
    > 0.3 within 10 columns) and parallel-beam (both neighbors > 2% of range)
    rejection,
  - `extractFeatures` (:147-246): per ring, 6 azimuth sectors, up to 20
    sharpest edges (curvature > edgeThreshold), surfaces = curvature <
    surfThreshold; neighbor suppression around picked features.

TPU design: everything is a fixed-shape op on the (n_scan, horizon) image:
curvature via shifted sums, sector selection via top_k over a reshaped
(n_scan, 6, horizon/6) view, suppression via shifted masks.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .projection import RangeImage, _INF


@dataclasses.dataclass(frozen=True)
class FeatureConfig:
    edge_threshold: float = 1.0      # edgeThreshold (utility.h)
    surf_threshold: float = 0.1      # surfThreshold
    n_sectors: int = 6               # per-ring azimuth split
    max_edge_per_sector: int = 20
    occlusion_jump: float = 0.3
    parallel_frac: float = 0.02
    half_window: int = 5


class Features(NamedTuple):
    curvature: jnp.ndarray   # (S, H)
    edge_mask: jnp.ndarray   # (S, H)
    surf_mask: jnp.ndarray   # (S, H)


def _shift_cols(a, k, fill):
    """Shift along the column axis with fill (no wraparound — ring ends don't
    see each other, matching the reference's index bounds)."""
    if k == 0:
        return a
    rolled = jnp.roll(a, k, axis=1)
    H = a.shape[1]
    if k > 0:
        return rolled.at[:, :k].set(fill)
    return rolled.at[:, k:].set(fill)


@functools.partial(jax.jit, static_argnames=("cfg",))
def extract(cfg: FeatureConfig, img: RangeImage) -> Features:
    S, H = img.rng.shape
    r = jnp.where(img.valid, img.rng, 0.0)
    v = img.valid

    # curvature over +-half_window valid windows
    acc = -2.0 * cfg.half_window * r
    cnt_ok = v
    for k in range(1, cfg.half_window + 1):
        acc = acc + _shift_cols(r, k, 0.0) + _shift_cols(r, -k, 0.0)
        cnt_ok = cnt_ok & _shift_cols(v, k, False) & _shift_cols(v, -k, False)
    curvature = acc * acc

    # occlusion: big range jump between adjacent columns hides a band of 5
    nxt = _shift_cols(r, -1, _INF)
    occl_right = v & (r - nxt > cfg.occlusion_jump)   # this pixel occludes ->
    occl_left = v & (nxt - r > cfg.occlusion_jump)
    blocked = jnp.zeros_like(v)
    for k in range(0, 6):
        blocked = blocked | _shift_cols(occl_right, -k, False)   # pixels behind the edge
        blocked = blocked | _shift_cols(occl_left, k + 1, False)
    # parallel beams: both neighbors differ by > 2% of range
    d1 = jnp.abs(_shift_cols(r, 1, 0.0) - r)
    d2 = jnp.abs(_shift_cols(r, -1, 0.0) - r)
    parallel = v & (d1 > cfg.parallel_frac * r) & (d2 > cfg.parallel_frac * r)

    good = cnt_ok & ~blocked & ~parallel

    # sector split + top-k edges per sector
    Hs = H // cfg.n_sectors
    curv_sec = jnp.where(good, curvature, -1.0).reshape(S, cfg.n_sectors, Hs)
    topv, topi = jax.lax.top_k(curv_sec, cfg.max_edge_per_sector)
    thresh_ok = topv > cfg.edge_threshold
    edge_sec = jnp.zeros((S, cfg.n_sectors, Hs), bool)
    edge_sec = edge_sec.at[
        jnp.arange(S)[:, None, None],
        jnp.arange(cfg.n_sectors)[None, :, None],
        topi,
    ].set(thresh_ok)
    edge_mask = edge_sec.reshape(S, H) & good

    # neighbor suppression around edges (reference marks +-5 neighbors picked)
    sup = edge_mask
    for k in range(1, cfg.half_window + 1):
        sup = sup | _shift_cols(edge_mask, k, False) | _shift_cols(edge_mask, -k, False)
    surf_mask = good & (curvature < cfg.surf_threshold) & ~sup
    return Features(curvature=curvature, edge_mask=edge_mask, surf_mask=surf_mask)


def gather_features(img: RangeImage, mask2d: jnp.ndarray):
    """Flatten an image feature mask into an SoA cloud (3, S*H) + mask."""
    pts = jnp.stack([img.x.reshape(-1), img.y.reshape(-1), img.z.reshape(-1)], axis=0)
    return pts, mask2d.reshape(-1)
