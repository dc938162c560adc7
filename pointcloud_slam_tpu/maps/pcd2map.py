"""Cloud post-processing: voxel downsample + z-band slice (pcd2map pipeline)
and 3-D occupancy (z-column) summaries.

Behavioral parity targets:
  - `src/tool/pcd2map/src/pcd2map.cpp:20-100`: load PCD -> VoxelGrid
    downsample -> PassThrough z band -> republish as the navigation cloud,
  - `src/tool/octomap_server/src/OctomapServer.cpp`: 3-D octree insertion +
    2-D downprojection. The octree is replaced by a dense 3-D voxel occupancy
    over a bounded volume plus the same 2-D projection product.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import ops


@functools.partial(jax.jit, static_argnames=())
def z_band_filter(points: jnp.ndarray, mask: jnp.ndarray, z_min: float, z_max: float):
    """PassThrough on z (pcd2map.cpp passthrough)."""
    return mask & (points[2] >= z_min) & (points[2] <= z_max)


def pcd_to_nav_cloud(points: jnp.ndarray, mask: jnp.ndarray, leaf: float, z_min: float, z_max: float):
    """The pcd2map product: downsampled, z-sliced cloud (3, N) + mask."""
    pts, m = ops.voxel_downsample(points, mask, leaf)
    return pts, z_band_filter(pts, m, z_min, z_max)


@dataclasses.dataclass(frozen=True)
class VolumeConfig:
    """Dense 3-D occupancy volume (octomap_server role over a bounded box)."""

    nx: int = 512
    ny: int = 512
    nz: int = 64
    resolution: float = 0.2
    origin: tuple = (-51.2, -51.2, -3.2)


class OccupancyVolume(NamedTuple):
    hits: jnp.ndarray  # uint32 (nx, ny, nz) hit counts


def create_volume(cfg: VolumeConfig) -> OccupancyVolume:
    return OccupancyVolume(hits=jnp.zeros((cfg.nx, cfg.ny, cfg.nz), jnp.uint32))


@functools.partial(jax.jit, static_argnames=("cfg",))
def insert_volume(cfg: VolumeConfig, vol: OccupancyVolume, points: jnp.ndarray, mask: jnp.ndarray) -> OccupancyVolume:
    ox, oy, oz = cfg.origin
    i = jnp.floor((points[0] - ox) / cfg.resolution).astype(jnp.int32)
    j = jnp.floor((points[1] - oy) / cfg.resolution).astype(jnp.int32)
    k = jnp.floor((points[2] - oz) / cfg.resolution).astype(jnp.int32)
    ok = mask & (i >= 0) & (i < cfg.nx) & (j >= 0) & (j < cfg.ny) & (k >= 0) & (k < cfg.nz)
    flat = jnp.where(ok, (i * cfg.ny + j) * cfg.nz + k, cfg.nx * cfg.ny * cfg.nz)
    hits = vol.hits.reshape(-1).at[flat].add(1, mode="drop")
    return OccupancyVolume(hits=hits.reshape(cfg.nx, cfg.ny, cfg.nz))


@functools.partial(jax.jit, static_argnames=("cfg", "min_hits"))
def project_2d(cfg: VolumeConfig, vol: OccupancyVolume, min_hits: int = 2) -> jnp.ndarray:
    """OctomapServer 2-D downprojection: a column is occupied if any z cell is."""
    return jnp.any(vol.hits >= min_hits, axis=2)
