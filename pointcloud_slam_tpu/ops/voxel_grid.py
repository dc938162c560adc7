"""Fixed-capacity voxel-hash point map — the TPU-native replacement for iVox.

Behavioral parity target (structure re-designed for static shapes):
  reference `src/jueying_lio/include/ivox3d/ivox3d.h` (voxel hash + LRU
  eviction + 1/7/19/27-voxel stencil kNN) and
  `ivox3d_node.hpp` (per-voxel point storage + KNN-by-condition).

Design (TPU-first):
  * open-addressing hash table over `capacity` slots (power of two), linear
    probing with a fixed probe window; stale slots are evicted by LRU stamp
    inside the probe window — this plays the role of iVox's global LRU list
    (`ivox3d.h:257-281`) without pointer chasing.
  * each slot stores up to `pts_per_voxel` points in a dense block; inserts
    beyond that are dropped (the odometry pipeline's map-downsample gating
    keeps per-voxel occupancy low, mirroring the reference's behavior).
  * kNN is a gather over the stencil neighborhood's candidate points + masked
    top-k — dense, static shapes, no data-dependent control flow.

Everything is functionally pure: `insert` returns a new map pytree, so the
whole odometry loop stays inside one jitted program with the map as carried
state.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

_INF = jnp.float32(3.0e38)


@dataclasses.dataclass(frozen=True)
class GridConfig:
    """Static configuration (hashable; close over it or pass as static arg)."""

    capacity: int = 1 << 18          # number of voxel slots (power of two)
    pts_per_voxel: int = 8           # dense point block per voxel
    resolution: float = 0.5          # voxel edge length (m)
    probe: int = 8                   # linear-probe window
    nearby: int = 7                  # stencil: 1, 7, 19 or 27 voxels

    def __post_init__(self):
        assert self.capacity & (self.capacity - 1) == 0, "capacity must be a power of two"
        assert self.nearby in (1, 7, 19, 27)


class VoxelHashMap(NamedTuple):
    keys: jnp.ndarray      # int32 (C, 3) voxel coords
    occupied: jnp.ndarray  # bool (C,)
    pts: jnp.ndarray       # float32 (C, K, 3)
    npts: jnp.ndarray      # int32 (C,)
    stamp: jnp.ndarray     # int32 (C,) LRU stamp
    counter: jnp.ndarray   # int32 () insert-epoch counter


def create(config: GridConfig, dtype=jnp.float32) -> VoxelHashMap:
    C, K = config.capacity, config.pts_per_voxel
    return VoxelHashMap(
        keys=jnp.zeros((C, 3), jnp.int32),
        occupied=jnp.zeros((C,), bool),
        pts=jnp.zeros((C, K, 3), dtype),
        npts=jnp.zeros((C,), jnp.int32),
        stamp=jnp.zeros((C,), jnp.int32),
        counter=jnp.zeros((), jnp.int32),
    )


def stencil_offsets(nearby: int) -> np.ndarray:
    """Neighbor voxel offsets, matching iVox NearbyType (ivox3d.h:212-235)."""
    offs = [(0, 0, 0)]
    faces = [(-1, 0, 0), (1, 0, 0), (0, -1, 0), (0, 1, 0), (0, 0, -1), (0, 0, 1)]
    edges = [
        (1, 1, 0), (-1, 1, 0), (1, -1, 0), (-1, -1, 0),
        (1, 0, 1), (-1, 0, 1), (1, 0, -1), (-1, 0, -1),
        (0, 1, 1), (0, -1, 1), (0, 1, -1), (0, -1, -1),
    ]
    corners = [(1, 1, 1), (-1, 1, 1), (1, -1, 1), (1, 1, -1), (-1, -1, 1), (-1, 1, -1), (1, -1, -1), (-1, -1, -1)]
    if nearby >= 7:
        offs += faces
    if nearby >= 19:
        offs += edges
    if nearby >= 27:
        offs += corners
    return np.asarray(offs, np.int32)


def point_to_voxel(points: jnp.ndarray, resolution: float) -> jnp.ndarray:
    """World point -> integer voxel coordinate (floor semantics, ivox Pos2Grid)."""
    return jnp.floor(points / resolution).astype(jnp.int32)


def _hash(coords: jnp.ndarray, capacity: int) -> jnp.ndarray:
    """Spatial hash: prime multiply/xor combine + murmur3 finalizer.

    The bare Teschner combine (as in ivox/vector3_hash) collides heavily in the
    low bits for small coordinate ranges; the finalizer gives avalanche so the
    power-of-two masked buckets stay uniform.
    """
    c = coords.astype(jnp.uint32)
    # additive combine: the XOR combine collides for coordinate sign-flips
    h = c[..., 0] * jnp.uint32(73856093) + c[..., 1] * jnp.uint32(19349669) + c[..., 2] * jnp.uint32(83492791)
    h = h ^ (h >> 16)
    h = h * jnp.uint32(0x85EBCA6B)
    h = h ^ (h >> 13)
    h = h * jnp.uint32(0xC2B2AE35)
    h = h ^ (h >> 16)
    return (h & jnp.uint32(capacity - 1)).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("config",))
def lookup(config: GridConfig, grid: VoxelHashMap, coords: jnp.ndarray) -> jnp.ndarray:
    """Find the slot holding each voxel coord. (..., 3) -> (...,) int32, -1 if absent."""
    h0 = _hash(coords, config.capacity)

    def body(j, found):
        s = (h0 + j) & (config.capacity - 1)
        match = grid.occupied[s] & jnp.all(grid.keys[s] == coords, axis=-1)
        return jnp.where((found < 0) & match, s, found)

    # derive the init from h0 so shard_map's varying-axis typing is preserved
    found = h0 * 0 - 1
    return jax.lax.fori_loop(0, config.probe, body, found)


def _claim_slots(config: GridConfig, keys, occupied, stamp, counter, coords, mask):
    """Choose a slot per insert-coord: existing match, else empty, else LRU-evict.

    Slots whose stamp equals the current counter were claimed earlier in this
    same batch and are never eviction candidates, so a settled claim cannot be
    stolen by a later round. Returns (slot (N,), is_new (N,)) with
    slot == capacity for points that found no slot.
    """
    C = config.capacity
    h0 = _hash(coords, C)
    big = jnp.int32(C)

    def body(j, carry):
        match_slot, empty_slot, evict_slot, evict_stamp = carry
        s = (h0 + j) & (C - 1)
        occ = occupied[s]
        match = occ & jnp.all(keys[s] == coords, axis=-1)
        match_slot = jnp.where((match_slot >= big) & match, s, match_slot)
        empty_slot = jnp.where((empty_slot >= big) & ~occ, s, empty_slot)
        st = stamp[s]
        better = occ & (st < counter) & (st < evict_stamp)
        evict_slot = jnp.where(better, s, evict_slot)
        evict_stamp = jnp.where(better, st, evict_stamp)
        return match_slot, empty_slot, evict_slot, evict_stamp

    zero = h0 * 0  # keeps shard_map varying-axis typing
    init = (zero + big, zero + big, zero + big, zero + jnp.iinfo(jnp.int32).max)
    match_slot, empty_slot, evict_slot, _ = jax.lax.fori_loop(0, config.probe, body, init)
    slot = jnp.where(match_slot < big, match_slot, jnp.where(empty_slot < big, empty_slot, evict_slot))
    is_new = match_slot >= big
    slot = jnp.where(mask, slot, big)  # unmasked -> out-of-bounds (scatter mode="drop")
    return slot, is_new


_CLAIM_ROUNDS = 4


@functools.partial(jax.jit, static_argnames=("config",))
def insert(config: GridConfig, grid: VoxelHashMap, points: jnp.ndarray, mask: jnp.ndarray) -> VoxelHashMap:
    """Insert masked points. points (N, 3), mask (N,) bool. Returns the new map.

    Claiming runs a few rounds so same-batch hash collisions between different
    voxels resolve (the loser re-probes against the updated table). Points in a
    full per-voxel block are dropped, and under extreme table pressure the
    oldest slot in the probe window is evicted — both mirror the
    bounded-memory behavior of iVox's LRU + capacity limits (ivox3d.h:257-281).
    """
    C, K = config.capacity, config.pts_per_voxel
    coords = point_to_voxel(points, config.resolution)
    counter = grid.counter + 1  # fresh stamp for this batch
    keys, occupied, npts, stamp = grid.keys, grid.occupied, grid.npts, grid.stamp
    remaining = mask
    slot = jnp.full(mask.shape, C, jnp.int32)
    for _ in range(_CLAIM_ROUNDS):
        round_slot, is_new = _claim_slots(config, keys, occupied, stamp, counter, coords, remaining)
        claim_idx = jnp.where(remaining & is_new, round_slot, C)
        keys = keys.at[claim_idx].set(coords, mode="drop")
        occupied = occupied.at[claim_idx].set(True, mode="drop")
        npts = npts.at[claim_idx].set(0, mode="drop")
        key_after = keys.at[jnp.minimum(round_slot, C - 1)].get(mode="clip")
        won = remaining & (round_slot < C) & jnp.all(key_after == coords, axis=-1)
        slot = jnp.where(won, round_slot, slot)
        stamp = stamp.at[jnp.where(won, round_slot, C)].set(counter, mode="drop")
        remaining = remaining & ~won

    ok = mask & (slot < C)

    # in-batch rank within each slot (stable sort by slot, rank = i - first_occ)
    N = points.shape[0]
    order = jnp.argsort(slot)
    sorted_slot = slot[order]
    idx = jnp.arange(N, dtype=jnp.int32)
    is_first = jnp.concatenate([jnp.ones((1,), bool), sorted_slot[1:] != sorted_slot[:-1]])
    first_idx = jax.lax.associative_scan(jnp.maximum, jnp.where(is_first, idx, 0))
    rank_sorted = idx - first_idx
    rank = jnp.zeros((N,), jnp.int32).at[order].set(rank_sorted)

    base = npts.at[jnp.minimum(slot, C - 1)].get(mode="clip")
    write_idx = base + rank
    fits = ok & (write_idx < K)
    flat = jnp.where(fits, slot * K + write_idx, C * K)
    pts = grid.pts.reshape(C * K, 3).at[flat].set(points.astype(grid.pts.dtype), mode="drop").reshape(C, K, 3)

    adds = jnp.zeros((C,), jnp.int32).at[jnp.where(fits, slot, C)].add(1, mode="drop")
    npts = npts + adds
    return VoxelHashMap(keys, occupied, pts, npts, stamp, counter)


@functools.partial(jax.jit, static_argnames=("config", "k"))
def knn(config: GridConfig, grid: VoxelHashMap, queries: jnp.ndarray, k: int = 5, max_range: float = 5.0):
    """k nearest map points for each query point over the stencil neighborhood.

    queries (M, 3) -> (neighbors (M, k, 3), d2 (M, k), count (M,)).
    Invalid neighbors have d2 == +inf; `count` is the number of valid ones.
    """
    offsets = jnp.asarray(stencil_offsets(config.nearby))  # (S, 3)
    S = offsets.shape[0]
    K = config.pts_per_voxel
    coords = point_to_voxel(queries, config.resolution)  # (M, 3)
    ncoords = coords[:, None, :] + offsets[None, :, :]  # (M, S, 3)
    slot = lookup(config, grid, ncoords)  # (M, S)
    safe_slot = jnp.maximum(slot, 0)
    cand = grid.pts[safe_slot]  # (M, S, K, 3)
    counts = jnp.where(slot >= 0, grid.npts[safe_slot], 0)  # (M, S)
    valid = jax.lax.broadcasted_iota(jnp.int32, (1, 1, K), 2) < counts[:, :, None]  # (M, S, K)
    diff = cand - queries[:, None, None, :]
    d2 = jnp.sum(diff * diff, axis=-1)
    d2 = jnp.where(valid & (d2 <= max_range * max_range), d2, _INF)
    d2_flat = d2.reshape(queries.shape[0], S * K)
    neg_top, top_idx = jax.lax.top_k(-d2_flat, k)
    top_d2 = -neg_top
    cand_flat = cand.reshape(queries.shape[0], S * K, 3)
    neighbors = jnp.take_along_axis(cand_flat, top_idx[:, :, None], axis=1)
    count = jnp.sum(top_d2 < _INF, axis=-1).astype(jnp.int32)
    return neighbors, top_d2, count


def num_voxels(grid: VoxelHashMap) -> jnp.ndarray:
    return jnp.sum(grid.occupied.astype(jnp.int32))
