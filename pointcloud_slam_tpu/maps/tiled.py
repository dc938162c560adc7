"""Large-world maps: unbounded 2-D occupancy tiling + hash-based 3-D occupancy.

Behavioral parity targets:
  - `TiledOccupancyMap` replaces the reference's expandable quadtree
    (`src/tool/occupancy_mapping/include/occupancy_mapping/occupancy_map.hpp`
    `extendMap` :114-149, `MapTreeNode`): the world is a host-side dict of
    fixed-size dense device tiles; a scan touches at most a few tiles and each
    update reuses ONE compiled kernel with the tile origin as a runtime arg.
    Stitching produces a single grid + origin for PGM export.
  - `VoxelOccupancy3D` plays the octomap_server role
    (`src/tool/octomap_server/src/OctomapServer.cpp` insertCloudCallback):
    log-odds per 3-D voxel in a fixed-capacity direct-addressed hash table —
    unbounded world extent in bounded memory (collisions overwrite by
    recency, the same bounded-memory contract as iVox's LRU). Includes the
    2-D down-projection the reference publishes.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Dict, NamedTuple, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.voxel_grid import _fingerprint, _hash3
from . import occupancy as occ


class TiledOccupancyMap:
    """Host-side unbounded 2-D occupancy map over device tiles.

    Tiles are created on demand as the trajectory expands (extendMap role).
    All device work (ray casting, log-odds scatter) runs per touched tile with
    the shared jitted kernel."""

    def __init__(self, cfg: occ.OccupancyConfig):
        self.cfg = cfg
        self.tile_extent = cfg.size * cfg.resolution
        self.tiles: Dict[Tuple[int, int], occ.OccupancyGrid] = {}

    def _tile_of(self, x: float, y: float) -> Tuple[int, int]:
        return (int(math.floor(x / self.tile_extent)), int(math.floor(y / self.tile_extent)))

    def _origin(self, key: Tuple[int, int]) -> np.ndarray:
        return np.asarray([key[0] * self.tile_extent, key[1] * self.tile_extent], np.float32)

    def touched_tiles(self, x: float, y: float):
        """Tiles a scan at (x, y) can reach (pose ± max_range square)."""
        r = self.cfg.max_range
        t0 = self._tile_of(x - r, y - r)
        t1 = self._tile_of(x + r, y + r)
        return [(i, j) for i in range(t0[0], t1[0] + 1) for j in range(t0[1], t1[1] + 1)]

    def insert_cloud(self, points, mask, pose_xy, pose_yaw):
        """Update every touched tile from one world-frame cloud (3, N)."""
        x, y = float(pose_xy[0]), float(pose_xy[1])
        for key in self.touched_tiles(x, y):
            tile = self.tiles.get(key)
            if tile is None:
                tile = occ.create(self.cfg)
            tile = occ.insert_cloud(
                self.cfg, tile, points, mask, jnp.asarray(pose_xy), jnp.asarray(pose_yaw),
                origin=jnp.asarray(self._origin(key)),
            )
            self.tiles[key] = tile

    def stitch(self):
        """All tiles into one numpy log-odds array. Returns (logodds, origin_xy)."""
        assert self.tiles, "empty map"
        keys = list(self.tiles.keys())
        i0 = min(k[0] for k in keys)
        j0 = min(k[1] for k in keys)
        i1 = max(k[0] for k in keys)
        j1 = max(k[1] for k in keys)
        S = self.cfg.size
        out = np.zeros(((i1 - i0 + 1) * S, (j1 - j0 + 1) * S), np.float32)
        for (i, j), tile in self.tiles.items():
            out[(i - i0) * S : (i - i0 + 1) * S, (j - j0) * S : (j - j0 + 1) * S] = np.asarray(tile.logodds)
        origin = np.asarray([i0 * self.tile_extent, j0 * self.tile_extent], np.float32)
        return out, origin

    def save_pgm(self, path: str):
        """Stitched PGM + YAML with the true world origin."""
        lo, origin = self.stitch()
        grid = occ.OccupancyGrid(logodds=jnp.asarray(lo))
        big = dataclasses.replace(self.cfg, size=lo.shape[0])
        # non-square stitches need the generic writer; reuse occ.save_pgm on a
        # square-padded array for simplicity
        if lo.shape[0] != lo.shape[1]:
            n = max(lo.shape)
            pad = np.zeros((n, n), np.float32)
            pad[: lo.shape[0], : lo.shape[1]] = lo
            grid = occ.OccupancyGrid(logodds=jnp.asarray(pad))
            big = dataclasses.replace(self.cfg, size=n)
        occ.save_pgm(big, grid, path, origin=origin)


# ---------------------------------------------------------------------------
# 3-D hash-based occupancy (octomap_server role)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class VoxelOccConfig:
    capacity: int = 1 << 20          # voxel slots (power of two)
    resolution: float = 0.2          # m / voxel
    n_free_steps: int = 32           # free-space samples per beam
    logodd_occ: float = 0.85         # octomap defaults: hit 0.85, miss -0.4
    logodd_free: float = -0.4
    logodd_min: float = -2.0         # octomap clamping thresholds
    logodd_max: float = 3.5
    occ_thresh_logodd: float = 0.0   # occupied when logodds > 0

    def __post_init__(self):
        assert self.capacity & (self.capacity - 1) == 0


class VoxelOccupancy3D(NamedTuple):
    fp: jnp.ndarray        # (C,) uint32 voxel fingerprint (0 = empty)
    keys: jnp.ndarray      # (3, C) int32 voxel coords (for export)
    logodds: jnp.ndarray   # (C,)


def create_3d(cfg: VoxelOccConfig, dtype=jnp.float32) -> VoxelOccupancy3D:
    C = cfg.capacity
    return VoxelOccupancy3D(
        fp=jnp.zeros((C,), jnp.uint32),
        keys=jnp.zeros((3, C), jnp.int32),
        logodds=jnp.zeros((C,), dtype),
    )


def _slot_update(cfg, m: VoxelOccupancy3D, cx, cy, cz, delta, valid):
    """Scatter log-odds deltas into direct-addressed voxel slots.

    A slot colliding with a DIFFERENT voxel is recycled (fingerprint + coords
    overwritten, log-odds reset to the delta) — recency-wins bounded memory,
    the hash-table analogue of octomap's pruning."""
    C = cfg.capacity
    s = _hash3(cx, cy, cz, C)
    fpq = _fingerprint(cx, cy, cz)
    same = m.fp[s] == fpq
    tgt = jnp.where(valid, s, C)
    # recycled slots: overwrite identity, reset logodds to 0 before the add
    reset = valid & ~same
    logodds = m.logodds.at[jnp.where(reset, tgt, C)].set(0.0, mode="drop")
    logodds = logodds.at[tgt].add(delta, mode="drop")
    logodds = jnp.clip(logodds, cfg.logodd_min, cfg.logodd_max)
    fp = m.fp.at[tgt].set(fpq, mode="drop")
    keys = m.keys.at[0, tgt].set(cx, mode="drop")
    keys = keys.at[1, tgt].set(cy, mode="drop")
    keys = keys.at[2, tgt].set(cz, mode="drop")
    return VoxelOccupancy3D(fp=fp, keys=keys, logodds=logodds)


@functools.partial(jax.jit, static_argnames=("cfg",))
def insert_cloud_3d(cfg: VoxelOccConfig, m: VoxelOccupancy3D, points: jnp.ndarray, mask: jnp.ndarray, origin):
    """octomap insertCloudCallback: for each beam origin->point, free-space
    samples along the ray and an occupied hit at the endpoint."""
    res = cfg.resolution
    o = jnp.asarray(origin)
    d = points - o[:, None]                      # (3, N)
    # free samples strictly inside the beam (exclude the hit voxel)
    fr = (jnp.arange(cfg.n_free_steps, dtype=points.dtype) + 0.5) / (cfg.n_free_steps + 1)
    fpts = o[:, None, None] + d[:, None, :] * fr[None, :, None]   # (3, S, N)
    fx = jnp.floor(fpts / res).astype(jnp.int32)
    # drop free samples that fall in the endpoint's voxel
    ex = jnp.floor(points / res).astype(jnp.int32)                # (3, N)
    in_end = jnp.all(fx == ex[:, None, :], axis=0)
    fvalid = mask[None, :] & ~in_end
    m = _slot_update(
        cfg, m,
        fx[0].reshape(-1), fx[1].reshape(-1), fx[2].reshape(-1),
        cfg.logodd_free, fvalid.reshape(-1),
    )
    m = _slot_update(cfg, m, ex[0], ex[1], ex[2], cfg.logodd_occ, mask)
    return m


def occupied_voxels(cfg: VoxelOccConfig, m: VoxelOccupancy3D):
    """Occupied voxel centers (host): (M, 3) float32."""
    lo = np.asarray(m.logodds)
    fp = np.asarray(m.fp)
    sel = (fp != 0) & (lo > cfg.occ_thresh_logodd)
    keys = np.asarray(m.keys)[:, sel]
    return (keys.T.astype(np.float32) + 0.5) * cfg.resolution


def project_2d(cfg: VoxelOccConfig, m: VoxelOccupancy3D, z_min: float, z_max: float,
               size: int, res2d: float, origin_xy):
    """2-D down-projection of the occupied voxels in a z band — the
    octomap_server downprojected 2-D map. Returns an int8 trinary grid."""
    pts = occupied_voxels(cfg, m)
    sel = (pts[:, 2] >= z_min) & (pts[:, 2] <= z_max)
    pts = pts[sel]
    gi = np.floor((pts[:, 0] - origin_xy[0]) / res2d).astype(np.int64)
    gj = np.floor((pts[:, 1] - origin_xy[1]) / res2d).astype(np.int64)
    ok = (gi >= 0) & (gi < size) & (gj >= 0) & (gj < size)
    out = np.full((size, size), -1, np.int8)
    out[gi[ok], gj[ok]] = 100
    return out
