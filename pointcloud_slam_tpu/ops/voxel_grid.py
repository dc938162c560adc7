"""Fixed-capacity voxel-hash point map — the TPU-native replacement for iVox.

Behavioral parity target (structure re-designed for static shapes):
  reference `src/jueying_lio/include/ivox3d/ivox3d.h` (voxel hash + LRU
  eviction + 1/7/19/27-voxel stencil kNN) and
  `ivox3d_node.hpp` (per-voxel point storage + KNN-by-condition).

Design (TPU-first):
  * ALL point data is structure-of-arrays with the big axis minor:
    clouds are (3, N), per-voxel blocks are (3, K, C). TPU tiles the last
    array dim onto 128 vector lanes — an (N, 3) layout wastes 42x bandwidth
    and costs ~200x on the gather-heavy kNN path (measured).
  * open-addressing hash table over `capacity` slots (power of two), linear
    probing with a fixed window; under pressure the oldest slot in the window
    is evicted by LRU stamp — playing the role of iVox's global LRU list
    (`ivox3d.h:257-281`) without pointer chasing.
  * kNN unrolls the stencil x per-voxel-block loop into pure vectorized
    gathers + an insertion-sort top-k over running best arrays — dense,
    static shapes, no data-dependent control flow.

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

# NOTE: must be a python literal, NOT jnp.float32(...): a device-resident
# scalar created at import time embeds as a non-literal constant in every jit
# that closes over it, defeating XLA constant folding (measured ~800x slower
# kNN and 10x longer compiles).
_INF = float(np.float32(3.0e38))


@dataclasses.dataclass(frozen=True)
class GridConfig:
    """Static configuration (hashable; close over it or pass as static arg)."""

    capacity: int = 1 << 18          # number of voxel slots (power of two)
    pts_per_voxel: int = 8           # dense point block per voxel
    resolution: float = 0.5          # voxel edge length (m)
    probe: int = 8                   # linear-probe window
    nearby: int = 7                  # stencil: 1, 7, 19 or 27 voxels
    # scatter-race resolution rounds in insert(): 4 resolves one-shot map
    # builds with many brand-new voxels (incl. baked-stencil expansion);
    # per-frame odometry inserts into an established map can run 2 (losers
    # self-heal next frame — the winner created the voxel, so the retry
    # matches)
    claim_rounds: int = 4
    # baked mode: the stencil is applied at INSERT time (each point is stored
    # in every voxel whose stencil covers it), so a kNN query needs ONE
    # center-voxel lookup instead of `nearby` lookups. The hardware reason:
    # TPU gathers are ROW-rate-bound (~75 M lookups/s flat in column height
    # 4..64 lanes, measured), so the only way to make the search faster is
    # fewer lookups per query — inserts are cheap (once per point per frame)
    # while searches run num_iterations x per frame. Candidate sets are
    # identical to the unbaked stencil (same offsets, mirrored), up to
    # per-voxel capacity drops — size pts_per_voxel ~ nearby x unbaked K.
    # (A libtpu fusion miscompile hits programs that fuse the baked-grid kNN
    # gather chain directly into the plane fit: flaky worker crash, or
    # silently wrong neighbors in single-frame solves. Mitigated by an
    # optimization_barrier in register/icp.py::correspondences; repro matrix
    # in tools/repro_baked_single.py.)
    baked: bool = False
    # NOTE (measured, v5e): a "split table" variant — (P, C) fingerprint
    # table + a second direct gather of the point block per stencil offset —
    # was tried to avoid rebuilding the full (P*(1+3K), C) table every LIO
    # frame (~1.3 ms). It LOSES everywhere: the dependent second gather costs
    # more than the rebuild saves (5.6 vs 4.6 ms/frame even with one search
    # per frame). The monolithic one-gather-per-offset table stands.

    def __post_init__(self):
        assert self.capacity & (self.capacity - 1) == 0, "capacity must be a power of two"
        assert self.nearby in (1, 7, 19, 27)


class VoxelHashMap(NamedTuple):
    keys: jnp.ndarray      # int32 (3, C) voxel coords per slot
    fp: jnp.ndarray        # uint32 (C,) coord fingerprint, 0 = empty slot
    occupied: jnp.ndarray  # bool (C,)
    pts: jnp.ndarray       # float32 (3, K, C)
    npts: jnp.ndarray      # int32 (C,)
    stamp: jnp.ndarray     # int32 (C,) LRU stamp
    counter: jnp.ndarray   # int32 () insert-epoch counter


def create(config: GridConfig, dtype=jnp.float32) -> VoxelHashMap:
    C, K = config.capacity, config.pts_per_voxel
    return VoxelHashMap(
        keys=jnp.zeros((3, C), jnp.int32),
        fp=jnp.zeros((C,), jnp.uint32),
        occupied=jnp.zeros((C,), bool),
        pts=jnp.zeros((3, K, C), dtype),
        npts=jnp.zeros((C,), jnp.int32),
        stamp=jnp.zeros((C,), jnp.int32),
        counter=jnp.zeros((), jnp.int32),
    )


def stencil_offsets(nearby: int) -> np.ndarray:
    """Neighbor voxel offsets (S, 3), matching iVox NearbyType (ivox3d.h:212-235)."""
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
    """World points (3, N) -> integer voxel coords (3, N) (floor, ivox Pos2Grid)."""
    return jnp.floor(points / resolution).astype(jnp.int32)


def _hash3(cx: jnp.ndarray, cy: jnp.ndarray, cz: jnp.ndarray, capacity: int) -> jnp.ndarray:
    """Spatial hash: prime multiply additive combine + murmur3 finalizer.

    Additive combine (the XOR combine collides under coordinate sign flips)
    plus an avalanche finalizer so power-of-two masked buckets stay uniform.
    """
    h = (
        cx.astype(jnp.uint32) * jnp.uint32(73856093)
        + cy.astype(jnp.uint32) * jnp.uint32(19349669)
        + cz.astype(jnp.uint32) * jnp.uint32(83492791)
    )
    h = h ^ (h >> 16)
    h = h * jnp.uint32(0x85EBCA6B)
    h = h ^ (h >> 13)
    h = h * jnp.uint32(0xC2B2AE35)
    h = h ^ (h >> 16)
    return (h & jnp.uint32(capacity - 1)).astype(jnp.int32)


def _fingerprint(cx, cy, cz):
    """Secondary 32-bit coordinate hash used as the slot fingerprint.

    The kNN probe compares ONE fingerprint gather per probe instead of
    occupied + three exact coordinate gathers (4x less gather traffic on the
    hot path). Never 0 (0 marks an empty slot); a false fingerprint match
    needs two coords in one probe window with equal 32-bit hashes
    (~2^-32 per lookup — negligible against sensor noise).
    """
    h = (
        cx.astype(jnp.uint32) * jnp.uint32(0x9E3779B1)
        + cy.astype(jnp.uint32) * jnp.uint32(0x85EBCA77)
        + cz.astype(jnp.uint32) * jnp.uint32(0xC2B2AE3D)
    )
    h = h ^ (h >> 15)
    h = h * jnp.uint32(0x2C1B3C6D)
    h = h ^ (h >> 12)
    return h | jnp.uint32(1)


def _probe_match_fp(config, fp, cx, cy, cz):
    """Fingerprint linear-probe search (1 gather per probe). -1 if absent."""
    C = config.capacity
    h0 = _hash3(cx, cy, cz, C)
    fpq = _fingerprint(cx, cy, cz)
    found = h0 * 0 - 1
    for j in range(config.probe):
        s = (h0 + j) & (C - 1)
        found = jnp.where((found < 0) & (fp[s] == fpq), s, found)
    return found


def _probe_match(config, keys, occupied, cx, cy, cz):
    """Vectorized linear-probe search. Returns slot per query (-1 if absent)."""
    C = config.capacity
    h0 = _hash3(cx, cy, cz, C)
    found = h0 * 0 - 1
    for j in range(config.probe):
        s = (h0 + j) & (C - 1)
        match = occupied[s] & (keys[0, s] == cx) & (keys[1, s] == cy) & (keys[2, s] == cz)
        found = jnp.where((found < 0) & match, s, found)
    return found


@functools.partial(jax.jit, static_argnames=("config",))
def lookup(config: GridConfig, grid: VoxelHashMap, coords: jnp.ndarray) -> jnp.ndarray:
    """Find the slot holding each voxel coord. coords (3, ...) -> (...,) int32, -1 if absent."""
    return _probe_match(config, grid.keys, grid.occupied, coords[0], coords[1], coords[2])


def _claim_round_fast(config: GridConfig, fp, npts, stamp, counter, cx, cy, cz, remaining, slot):
    """One scatter-race claim round over the probe window, gather-optimized.

    The whole probe window's (fingerprint, LRU stamp) state arrives in ONE
    (2P, N) column gather from a rolled table (the same trick as knn(): TPU
    gathers are row-rate-bound, so fewer/wider gathers win — the previous
    exact-key formulation cost ~5*P scalar gather rows per point per round,
    ~10x this one, and dominated the whole LIO frame budget).

    Matching is by 32-bit fingerprint (never 0; 0 marks an empty slot), the
    same compromise knn() already makes on the read path. Priority: existing
    match > empty slot > LRU-evict oldest (slots stamped `counter` were
    claimed earlier in this batch and are protected — the iVox LRU role,
    ivox3d.h:257-281). Claims scatter last-writer-wins, then a verify
    re-gather marks losers `remaining` for the next round.

    Returns (fp, npts, stamp, remaining, slot, fpq) with slot==capacity for
    unresolved points.
    """
    C, P = config.capacity, config.probe
    h0 = _hash3(cx, cy, cz, C)
    fpq = _fingerprint(cx, cy, cz)
    stamp_u = stamp.astype(jnp.uint32)
    tbl = jnp.concatenate(
        [
            jnp.stack([jnp.roll(fp, -j) for j in range(P)], 0),
            jnp.stack([jnp.roll(stamp_u, -j) for j in range(P)], 0),
        ],
        axis=0,
    )                                        # (2P, C)
    g = tbl[:, h0]                           # (2P, N) — ONE column gather
    fpg, stg = g[:P], g[P:]
    match = fpg == fpq[None, :]
    empty = fpg == jnp.uint32(0)
    has_match = jnp.any(match, axis=0)
    jm = jnp.argmax(match, axis=0).astype(jnp.int32)
    has_empty = jnp.any(empty, axis=0)
    je = jnp.argmax(empty, axis=0).astype(jnp.int32)
    old = (~empty) & (stg < counter.astype(jnp.uint32))
    ev = jnp.where(old, stg, jnp.uint32(0xFFFFFFFF))
    jv = jnp.argmin(ev, axis=0).astype(jnp.int32)
    has_evict = jnp.any(old, axis=0)
    j = jnp.where(has_match, jm, jnp.where(has_empty, je, jv))
    ok = remaining & (has_match | has_empty | has_evict)
    s = (h0 + j) & (C - 1)
    newc = ok & ~has_match
    tgt_new = jnp.where(newc, s, C)
    fp = fp.at[tgt_new].set(fpq, mode="drop")
    npts = npts.at[tgt_new].set(0, mode="drop") if npts is not None else None
    stamp = stamp.at[jnp.where(ok, s, C)].set(counter, mode="drop")
    won = ok & (fp[s] == fpq)                # verify re-gather
    slot = jnp.where(won, s, slot)
    remaining = remaining & ~won
    return fp, npts, stamp, remaining, slot


def _claim_loop(config: GridConfig, fp, stamp, counter, cx, cy, cz, mask, npts=None, rounds=None):
    """Run the claim rounds. Returns (fp, npts, stamp, slot) with slot ==
    capacity for unresolved/unmasked points. `npts` (per-voxel point count,
    reset to 0 on a fresh claim) is optional — the Gaussian grid accumulates
    moments instead and passes None."""
    C = config.capacity
    if rounds is None:
        rounds = config.claim_rounds
    remaining = mask
    slot = cx * 0 + C
    if npts is None:
        def body(_, c):
            fp, stamp, remaining, slot = c
            fp, _, stamp, remaining, slot = _claim_round_fast(
                config, fp, None, stamp, counter, cx, cy, cz, remaining, slot)
            return fp, stamp, remaining, slot
        fp, stamp, remaining, slot = jax.lax.fori_loop(0, rounds, body, (fp, stamp, remaining, slot))
        return fp, None, stamp, slot
    def body(_, c):
        fp, npts, stamp, remaining, slot = c
        return _claim_round_fast(config, fp, npts, stamp, counter, cx, cy, cz, remaining, slot)
    fp, npts, stamp, remaining, slot = jax.lax.fori_loop(
        0, rounds, body, (fp, npts, stamp, remaining, slot))
    return fp, npts, stamp, slot


@functools.partial(jax.jit, static_argnames=("config", "return_indices"))
def insert(config: GridConfig, grid: VoxelHashMap, points: jnp.ndarray, mask: jnp.ndarray, return_indices: bool = False):
    """Insert masked points. points (3, N), mask (N,) bool. Returns the new map.

    Claiming runs a few rounds so same-batch hash collisions between different
    voxels resolve (the loser re-probes against the updated table). Points in a
    full per-voxel block are dropped, and under extreme table pressure the
    oldest slot in the probe window is evicted — both mirror the
    bounded-memory behavior of iVox's LRU + capacity limits (ivox3d.h:257-281).
    """
    C, K = config.capacity, config.pts_per_voxel
    coords = point_to_voxel(points, config.resolution)
    if config.baked:
        # stencil baked into the map: store the point under every voxel whose
        # (mirrored) stencil contains it, so knn() reads one voxel per query
        assert not return_indices, "return_indices is not supported for baked grids"
        offs = stencil_offsets(config.nearby)  # (S, 3) static numpy
        S, Nin = len(offs), points.shape[1]
        offs_j = jnp.asarray(offs.T)  # (3, S)
        coords = (coords[:, None, :] + offs_j[:, :, None]).reshape(3, S * Nin)
        points = jnp.broadcast_to(points[:, None, :], (3, S, Nin)).reshape(3, S * Nin)
        mask = jnp.broadcast_to(mask[None, :], (S, Nin)).reshape(S * Nin)
    N = points.shape[1]
    cx, cy, cz = coords[0], coords[1], coords[2]
    counter = grid.counter + 1  # fresh stamp for this batch
    keys, occupied = grid.keys, grid.occupied
    fp, npts, stamp, slot = _claim_loop(config, grid.fp, grid.stamp, counter, cx, cy, cz, mask, npts=grid.npts)

    ok = mask & (slot < C)
    # exact keys + occupancy written once at the settled slots (matched slots
    # re-write their identical coords — harmless; the in-round state is fp-only)
    tgt = jnp.where(ok, slot, C)
    keys = keys.at[0, tgt].set(cx, mode="drop")
    keys = keys.at[1, tgt].set(cy, mode="drop")
    keys = keys.at[2, tgt].set(cz, mode="drop")
    occupied = occupied.at[tgt].set(True, mode="drop")

    # in-batch rank within each slot (stable sort by slot, rank = i - first_occ)
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
    flat = jnp.where(fits, write_idx * C + slot, C * K)  # (3, K*C) flattened target
    pts_flat = grid.pts.reshape(3, K * C)
    pts_flat = pts_flat.at[0, flat].set(points[0].astype(grid.pts.dtype), mode="drop")
    pts_flat = pts_flat.at[1, flat].set(points[1].astype(grid.pts.dtype), mode="drop")
    pts_flat = pts_flat.at[2, flat].set(points[2].astype(grid.pts.dtype), mode="drop")
    pts = pts_flat.reshape(3, K, C)

    adds = jnp.zeros((C,), jnp.int32).at[jnp.where(fits, slot, C)].add(1, mode="drop")
    npts = npts + adds
    new_grid = VoxelHashMap(keys, fp, occupied, pts, npts, stamp, counter)
    if return_indices:
        # flat (block_row * C + slot) write index per point, -1 if dropped —
        # lets callers scatter parallel per-point attribute arrays
        return new_grid, jnp.where(fits, flat, -1)
    return new_grid


def _fp_cnt_row(config: GridConfig, grid: VoxelHashMap) -> jnp.ndarray:
    """Fingerprint row with the per-voxel point count packed into the low 6 bits."""
    return (grid.fp & jnp.uint32(0xFFFFFFC0)) | jnp.minimum(grid.npts, config.pts_per_voxel).astype(jnp.uint32)


def _fp_table(config: GridConfig, grid: VoxelHashMap) -> jnp.ndarray:
    """Rolled fingerprint+count probe table (P, C) — the split/baked-mode table."""
    fp_cnt = _fp_cnt_row(config, grid)
    return jnp.concatenate([jnp.roll(fp_cnt, -j)[None, :] for j in range(config.probe)], axis=0)


@functools.partial(jax.jit, static_argnames=("config",))
def knn_table(config: GridConfig, grid: VoxelHashMap) -> jnp.ndarray:
    """Prebuild knn()'s shared per-search gather table.

    Full mode: the rolled probe-window table (P*(1+3K), C) — fingerprints,
    counts and ALL candidate points, so each stencil offset costs ONE column
    gather per query. The table is a pure function of the map; rebuilding it
    inside every knn call costs a (P*(1+3K)*C*4)-byte HBM copy per search
    (~27 MB for the production config). Callers that search the SAME map
    several times per frame (the LIO iterated update) build it once and pass
    it via knn(..., tbl=...).

    Baked mode: only the (P, C) rolled fingerprint+count table — candidate
    points are gathered straight from grid.pts at the matched slot."""
    C, K, P = config.capacity, config.pts_per_voxel, config.probe
    if config.baked:
        return _fp_table(config, grid)
    fp_cnt = _fp_cnt_row(config, grid)
    pts2d = grid.pts.reshape(3 * K, C)
    return jnp.concatenate(
        [
            jnp.concatenate(
                [
                    jnp.roll(fp_cnt, -j)[None, :],
                    jax.lax.bitcast_convert_type(jnp.roll(pts2d, -j, axis=1), jnp.uint32),
                ],
                axis=0,
            )
            for j in range(P)
        ],
        axis=0,
    )


@functools.partial(jax.jit, static_argnames=("config", "k"))
def knn(config: GridConfig, grid: VoxelHashMap, queries: jnp.ndarray, k: int = 5, max_range: float = 5.0,
        tbl: jnp.ndarray = None):
    """k nearest map points for each query over the stencil neighborhood.

    queries (3, N) -> (neighbors (3, k, N), d2 (k, N), count (N,), idx (k, N)).
    Invalid neighbors have d2 == +inf; `count` is the number of valid ones;
    `idx` is the flat map index (block_row * capacity + slot) of each
    neighbor, -1 if invalid — used to join per-point attribute arrays.
    The candidate loop (stencil x per-voxel block) is unrolled into pure
    vectorized compare/select chains — an insertion sort into k running-best
    registers, all on 128-lane vectors.

    Gather formulation (the hot-path trick): TPU XLA gathers cost ~8-13 ns per
    ROW regardless of row width up to ~64 lanes (measured 122 M rows/s for
    (32, C)[:, idx] column gathers vs 78 M rows/s for scalar gathers). So per
    stencil offset this does exactly TWO column gathers — one (2*probe, C)
    column holding the whole probe window's fingerprints + counts (built with
    jnp.roll shifts, ~free), and one (3K, C) column holding the entire voxel
    point block — instead of probe + 1 + 3K scalar gathers. 14 gather rows per
    query for the production config (nearby=7) vs 119 scalar rows before:
    measured ~12x faster search with bit-identical results.
    """
    C, K = config.capacity, config.pts_per_voxel
    P = config.probe
    offsets = stencil_offsets(config.nearby)  # (S, 3) static numpy
    N = queries.shape[1]
    dtype = grid.pts.dtype
    cq = point_to_voxel(queries, config.resolution)
    qx, qy, qz = queries[0], queries[1], queries[2]
    max_r2 = jnp.asarray(max_range, dtype) ** 2

    # ONE fused gather table: for each probe position j, a fingerprint+count
    # row (count packed into the low 4 fingerprint bits) followed by the whole
    # 3K-row point block, all rolled by -j so a single column gather at h0
    # yields the entire probe window INCLUDING its candidate points.
    # Build cost is a linear copy (~(P*(3K+1)*C)*4 bytes, ~0.1 ms at HBM rate),
    # amortized over the 20k-point query pass it accelerates.
    blk = 1 + 3 * K
    if tbl is None:
        tbl = knn_table(config, grid)

    zero = qx * 0
    # running best registers as stacked arrays updated with static-index
    # .at[r].set (dynamic-update-slice): XLA fuses the fully unrolled search
    # into one vectorized pass. Both a rolled fori carry chain and a
    # list-of-(N,)-registers where-chain formulation measured 100-1000x
    # slower / 20x longer to compile on TPU.
    best_d = jnp.full((k, N), _INF, dtype) + zero[None, :]
    best_xyz = jnp.zeros((3, k, N), dtype) + zero[None, None, :]
    best_i = jnp.full((k, N), -1, jnp.int32) + zero.astype(jnp.int32)[None, :]

    if config.baked:
        # ONE voxel lookup per query (the stencil was applied at insert):
        # gather 1 — the (P, C) rolled fingerprint+count table gives the whole
        # probe window in one row; gather 2 — the (3K, C) point block at the
        # matched slot. 2 gather rows/query vs `nearby` rows unbaked; the
        # gather row rate (~75 M rows/s flat in column height) is the search
        # bound, so this is a ~nearby/2 x speedup of the gather phase.
        def visit_baked(cand, d2, fi, best_d, best_xyz, best_i):
            for r in range(k):
                better = d2 < best_d[r]
                bd, bxyz, bi = best_d[r], best_xyz[:, r], best_i[r]
                best_d = best_d.at[r].set(jnp.where(better, d2, bd))
                best_xyz = best_xyz.at[:, r].set(jnp.where(better, cand, bxyz))
                best_i = best_i.at[r].set(jnp.where(better, fi, bi))
                d2 = jnp.where(better, bd, d2)
                cand = jnp.where(better, bxyz, cand)
                fi = jnp.where(better, bi, fi)
            return best_d, best_xyz, best_i

        cx, cy, cz = cq[0], cq[1], cq[2]
        h0 = _hash3(cx, cy, cz, C)
        fpq = _fingerprint(cx, cy, cz) & jnp.uint32(0xFFFFFFC0)
        g = tbl[:, h0]                                    # (P, N) — gather row 1
        match = (g & jnp.uint32(0xFFFFFFC0)) == fpq[None, :]
        jm = jnp.argmax(match, axis=0).astype(jnp.int32)
        safe = (h0 + jm) & (C - 1)
        first = match & (jnp.cumsum(match.astype(jnp.int32), axis=0) == 1)
        cnt = jnp.sum(jnp.where(first, (g & jnp.uint32(0x3F)).astype(jnp.int32), 0), axis=0)
        gpts = grid.pts.reshape(3 * K, C)[:, safe]        # (3K, N) — gather row 2
        for kk in range(K):
            px, py, pz = gpts[kk], gpts[K + kk], gpts[2 * K + kk]
            d2 = (px - qx) ** 2 + (py - qy) ** 2 + (pz - qz) ** 2
            d2 = jnp.where((kk < cnt) & (d2 <= max_r2), d2, _INF)
            best_d, best_xyz, best_i = visit_baked(
                jnp.stack([px, py, pz]), d2, kk * C + safe, best_d, best_xyz, best_i
            )
        count = jnp.sum(best_d < _INF, axis=0).astype(jnp.int32)
        return best_xyz, best_d, count, best_i

    def visit(cand, d2, fi, best_d, best_xyz, best_i):
        # insertion sort into the k running-best registers (static unroll)
        for r in range(k):
            better = d2 < best_d[r]
            bd, bxyz, bi = best_d[r], best_xyz[:, r], best_i[r]
            best_d = best_d.at[r].set(jnp.where(better, d2, bd))
            best_xyz = best_xyz.at[:, r].set(jnp.where(better, cand, bxyz))
            best_i = best_i.at[r].set(jnp.where(better, fi, bi))
            d2 = jnp.where(better, bd, d2)
            cand = jnp.where(better, bxyz, cand)
            fi = jnp.where(better, bi, fi)
        return best_d, best_xyz, best_i

    # unroll the per-voxel block loop when small (production configs); roll it
    # for large test configurations to bound compile time
    unroll_k = K <= 8

    for (ox_, oy_, oz_) in offsets.tolist():
        cx, cy, cz = cq[0] + ox_, cq[1] + oy_, cq[2] + oz_
        h0 = _hash3(cx, cy, cz, C)
        fpq = _fingerprint(cx, cy, cz) & jnp.uint32(0xFFFFFFC0)
        g = tbl[:, h0]                                   # (P*(1+3K), N) — ONE column gather
        fpg = g[0::blk][:P]                              # (P, N) fingerprint+count rows
        match = (fpg & jnp.uint32(0xFFFFFFC0)) == fpq[None, :]
        anym = jnp.any(match, axis=0)
        # first matching probe position (reference: first-match wins)
        jm = jnp.argmax(match, axis=0).astype(jnp.int32)
        safe = (h0 + jm) & (C - 1)
        first = match & (jnp.cumsum(match.astype(jnp.int32), axis=0) == 1)
        cnt = jnp.sum(jnp.where(first, (fpg & jnp.uint32(0x3F)).astype(jnp.int32), 0), axis=0)
        # select the matched probe position's point block (P-way select)
        gsel = jnp.zeros((3 * K, N), jnp.uint32)
        for j in range(P):
            gsel = jnp.where((jm == j) & anym, g[1 + j * blk : 1 + j * blk + 3 * K], gsel)
        gpts = jax.lax.bitcast_convert_type(gsel, dtype)  # (3K, N)
        if unroll_k:
            for kk in range(K):
                px, py, pz = gpts[kk], gpts[K + kk], gpts[2 * K + kk]
                d2 = (px - qx) ** 2 + (py - qy) ** 2 + (pz - qz) ** 2
                d2 = jnp.where((kk < cnt) & (d2 <= max_r2), d2, _INF)
                best_d, best_xyz, best_i = visit(
                    jnp.stack([px, py, pz]), d2, kk * C + safe, best_d, best_xyz, best_i
                )
        else:
            def block_body(kk, carry):
                best_d, best_xyz, best_i = carry
                px, py, pz = gpts[kk], gpts[K + kk], gpts[2 * K + kk]
                d2 = (px - qx) ** 2 + (py - qy) ** 2 + (pz - qz) ** 2
                d2 = jnp.where((kk < cnt) & (d2 <= max_r2), d2, _INF)
                return visit(jnp.stack([px, py, pz]), d2, kk * C + safe, best_d, best_xyz, best_i)

            best_d, best_xyz, best_i = jax.lax.fori_loop(0, K, block_body, (best_d, best_xyz, best_i))

    count = jnp.sum(best_d < _INF, axis=0).astype(jnp.int32)
    return best_xyz, best_d, count, best_i


def num_voxels(grid: VoxelHashMap) -> jnp.ndarray:
    return jnp.sum(grid.occupied.astype(jnp.int32))
