"""2-D occupancy-grid mapping with log-odds updates and vectorized ray casting.

Behavioral parity target (re-designed as dense ops):
  reference `src/tool/occupancy_mapping/`
  - `getScan` (mapping_server.cc:99-136): point cloud -> virtual 360 degree
    laser scan (z-band filter, per-angle minimum range),
  - `TraceLine` (:42-97): Bresenham free-space tracing (here: a fixed-step
    DDA sampled along every beam simultaneously — same visited-cell set up to
    tie-breaking),
  - `processScan` / `updateGrid` (occupancy_map.hpp:151-188): log-odds
    accumulation (occupied at the hit cell, free along the beam, clamped),
  - `getGridMap` / `publishMap` (:153-250): logit -> probability -> the
    trinary -1/0-100 OccupancyGrid convention,
  - `saveMap` (:252-344): PGM + YAML export with map_server thresholds
    (0.196 free / 0.65 occupied).

TPU design: the grid is a dense fixed-size array (the reference's expandable
quadtree exists to save CPU RAM; HBM prefers one dense tile). Beams update
cells by scatter-add of log-odds; the DDA runs as a (n_beams, n_steps) dense
sample grid in one shot.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class OccupancyConfig:
    size: int = 1024                 # cells per side (dense tile)
    resolution: float = 0.1          # m / cell (map_resolution)
    origin: float = -51.2            # world coord of cell (0, 0)
    n_beams: int = 720               # angle_increment = 2 pi / n_beams
    max_range: float = 20.0
    min_range: float = 0.3
    min_z: float = 0.2               # z band (occupancy_mapping config)
    max_z: float = 1.2
    logodd_occ: float = 0.9          # log-odds increments (occupancy_map.hpp)
    logodd_free: float = -0.7
    logodd_min: float = -10.0
    logodd_max: float = 10.0
    occ_thresh: float = 0.65         # map_server occupied threshold
    free_thresh: float = 0.196       # map_server free threshold
    # white-fill beams with no return out to max_range (the reference's
    # use_nan option, mapping_server.cc processScan); False = skip them, so
    # unobserved directions never clear cells behind unseen geometry
    use_nan: bool = False


class OccupancyGrid(NamedTuple):
    logodds: jnp.ndarray  # (size, size)


def create(cfg: OccupancyConfig, dtype=jnp.float32) -> OccupancyGrid:
    return OccupancyGrid(logodds=jnp.zeros((cfg.size, cfg.size), dtype))


@functools.partial(jax.jit, static_argnames=("cfg",))
def cloud_to_scan(cfg: OccupancyConfig, points: jnp.ndarray, mask: jnp.ndarray):
    """World/sensor-frame cloud (3, N) -> per-angle min range (n_beams,).

    Beams with no return in [min_range, max_range] carry +inf (the reference's
    NaN beams; callers may treat them as max_range-clearing rays).
    """
    x, y, z = points[0], points[1], points[2]
    rng = jnp.sqrt(x * x + y * y)
    ang = jnp.arctan2(y, x)  # [-pi, pi)
    beam = jnp.floor((ang + jnp.pi) / (2 * jnp.pi) * cfg.n_beams).astype(jnp.int32)
    beam = jnp.clip(beam, 0, cfg.n_beams - 1)
    ok = mask & (z >= cfg.min_z) & (z <= cfg.max_z) & (rng >= cfg.min_range) & (rng <= cfg.max_range)
    tgt = jnp.where(ok, beam, cfg.n_beams)
    ranges = jnp.full((cfg.n_beams,), jnp.inf, points.dtype).at[tgt].min(rng, mode="drop")
    return ranges


@functools.partial(jax.jit, static_argnames=("cfg",))
def insert_scan(cfg: OccupancyConfig, grid: OccupancyGrid, ranges: jnp.ndarray, pose_xy, pose_yaw,
                origin=None):
    """Log-odds update from a virtual scan at pose (x, y, yaw).

    Free cells along each beam (DDA at half-resolution steps), occupied cell
    at each hit. Matches processScan (mapping_server.cc:346-382).

    `origin` (2,) overrides the static cfg.origin — the tiled large-world map
    reuses ONE compiled kernel for every tile by passing each tile's world
    origin at runtime (the quadtree extendMap role, occupancy_map.hpp:114-149).
    """
    B = cfg.n_beams
    size, res = cfg.size, cfg.resolution
    dtype = grid.logodds.dtype
    if origin is None:
        ox = jnp.asarray(cfg.origin, dtype)
        oy = jnp.asarray(cfg.origin, dtype)
    else:
        ox, oy = origin[0], origin[1]
    angles = (jnp.arange(B, dtype=dtype) + 0.5) * (2 * jnp.pi / B) - jnp.pi + pose_yaw
    hit = jnp.isfinite(ranges)
    r = jnp.where(hit, ranges, cfg.max_range)
    beam_used = hit | jnp.asarray(cfg.use_nan)
    dirx, diry = jnp.cos(angles), jnp.sin(angles)

    # DDA free-space sampling: steps at half-resolution up to just short of r
    n_steps = int(cfg.max_range / (res * 0.5)) + 1
    step = jnp.arange(n_steps, dtype=dtype)[None, :] * (res * 0.5)
    along = jnp.minimum(step, (r - res)[:, None])
    fx = pose_xy[0] + dirx[:, None] * along
    fy = pose_xy[1] + diry[:, None] * along
    free_ok = (step <= (r - res)[:, None]) & beam_used[:, None]
    ci = jnp.floor((fx - ox) / res).astype(jnp.int32)
    cj = jnp.floor((fy - oy) / res).astype(jnp.int32)
    inb = (ci >= 0) & (ci < size) & (cj >= 0) & (cj < size) & free_ok
    flat = jnp.where(inb, ci * size + cj, size * size)
    # dedup per beam: consecutive duplicate cells add once (first occurrence)
    dup = jnp.concatenate([jnp.zeros((B, 1), bool), flat[:, 1:] == flat[:, :-1]], axis=1)
    flat = jnp.where(dup, size * size, flat)
    lo = grid.logodds.reshape(-1)
    lo = lo.at[flat.reshape(-1)].add(cfg.logodd_free, mode="drop")

    # occupied cells at hits
    hx = pose_xy[0] + dirx * r
    hy = pose_xy[1] + diry * r
    oi = jnp.floor((hx - ox) / res).astype(jnp.int32)
    oj = jnp.floor((hy - oy) / res).astype(jnp.int32)
    oin = hit & (oi >= 0) & (oi < size) & (oj >= 0) & (oj < size)
    oflat = jnp.where(oin, oi * size + oj, size * size)
    lo = lo.at[oflat].add(cfg.logodd_occ, mode="drop")
    lo = jnp.clip(lo, cfg.logodd_min, cfg.logodd_max)
    return OccupancyGrid(logodds=lo.reshape(size, size))


@functools.partial(jax.jit, static_argnames=("cfg",))
def insert_cloud(cfg: OccupancyConfig, grid: OccupancyGrid, points: jnp.ndarray, mask: jnp.ndarray, pose_xy, pose_yaw,
                 origin=None):
    """Convenience: sensor cloud (already in world frame, pose for the ray
    origin) -> scan -> log-odds update."""
    # convert to sensor-relative ranges/angles around pose
    rel = points - jnp.asarray([pose_xy[0], pose_xy[1], 0.0])[:, None]
    # rotate into the scan frame so beams line up with pose_yaw
    c, s = jnp.cos(-pose_yaw), jnp.sin(-pose_yaw)
    rx = c * rel[0] - s * rel[1]
    ry = s * rel[0] + c * rel[1]
    sens = jnp.stack([rx, ry, points[2]], axis=0)
    ranges = cloud_to_scan(cfg, sens, mask)
    return insert_scan(cfg, grid, ranges, pose_xy, pose_yaw, origin)


def to_probability(cfg: OccupancyConfig, grid: OccupancyGrid) -> jnp.ndarray:
    """Sigmoid(logodds) (getGridMap)."""
    return jax.nn.sigmoid(grid.logodds)


def to_ros_grid(cfg: OccupancyConfig, grid: OccupancyGrid) -> jnp.ndarray:
    """Trinary int8 map: -1 unknown, 0 free, 100 occupied (publishMap)."""
    p = to_probability(cfg, grid)
    unknown = grid.logodds == 0.0
    out = jnp.where(p > cfg.occ_thresh, 100, jnp.where(p < cfg.free_thresh, 0, -1))
    return jnp.where(unknown, -1, out).astype(jnp.int8)


def load_pgm(path: str):
    """Load a PGM+YAML map pair back into (trinary int8 grid, meta dict) —
    the map_server image_loader role (cloud_to_map/map_server, tested by its
    utest.cpp). Returns the grid in this module's axis convention."""
    from ..utils import config as cfgio

    meta = cfgio.load_yaml(path + ".yaml")
    with open(path + ".pgm", "rb") as f:
        magic = f.readline().strip()
        assert magic == b"P5", f"unsupported PGM magic {magic!r}"
        line = f.readline()
        while line.startswith(b"#"):
            line = f.readline()
        w, h = (int(v) for v in line.split())
        maxval = int(f.readline())
        img = np.frombuffer(f.read(w * h), np.uint8).reshape(h, w)
    # undo the save transform: rows were flipud(img.T)
    raw = np.flipud(img).T
    occ_th = float(meta.get("occupied_thresh", 0.65))
    free_th = float(meta.get("free_thresh", 0.196))
    occ = (255 - raw) / 255.0  # map_server occupancy convention (negate=0)
    grid = np.full(raw.shape, -1, np.int8)
    grid[occ > occ_th] = 100
    grid[occ < free_th] = 0
    return grid, meta


def save_pgm(cfg: OccupancyConfig, grid: OccupancyGrid, path: str, origin=None):
    """PGM + YAML export, map_server conventions (saveMap :252-344)."""
    ox, oy = (cfg.origin, cfg.origin) if origin is None else (float(origin[0]), float(origin[1]))
    p = np.asarray(to_probability(cfg, grid))
    unknown = np.asarray(grid.logodds) == 0.0
    img = np.full(p.shape, 205, np.uint8)  # unknown gray
    img[(~unknown) & (p < cfg.free_thresh)] = 254
    img[(~unknown) & (p > cfg.occ_thresh)] = 0
    # PGM row 0 = top: flip the y (j) axis; our axes: i = x cell, j = y cell
    img = np.flipud(img.T)
    with open(path + ".pgm", "wb") as f:
        f.write(f"P5\n{img.shape[1]} {img.shape[0]}\n255\n".encode())
        f.write(img.tobytes())
    with open(path + ".yaml", "w") as f:
        f.write(
            f"image: {path}.pgm\nresolution: {cfg.resolution}\n"
            f"origin: [{ox}, {oy}, 0.0]\nnegate: 0\n"
            f"occupied_thresh: {cfg.occ_thresh}\nfree_thresh: {cfg.free_thresh}\n"
        )
