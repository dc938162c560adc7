"""Gaussian voxel map: per-voxel mean/covariance/inverse-covariance statistics.

Behavioral parity targets (math re-derived, SoA layout):
  - reference `pointcloud_match/ndt_omp/include/pclomp/voxel_grid_covariance_omp.h`
    (per-leaf mean/cov with minimum-point gating and eigenvalue inflation,
    `applyFilter` _impl.hpp) — NDT target voxels,
  - reference `fast_gicp/include/fast_gicp/gicp/fast_vgicp_voxel.hpp`
    (GaussianVoxel append/finalize) and
    `fast_gicp/src/fast_gicp/cuda/gaussian_voxelmap.cu` (the GPU voxel hash
    with atomicCAS insertion — here: the same open-addressing claim rounds as
    the point map) — VGICP target voxels,
  - covariance regularization modes of
    `fast_gicp/.../fast_gicp_impl.hpp:241-298` (PLANE) and NDT's
    eigenvalue-inflation (`voxel_grid_covariance_omp_impl.hpp`).

Accumulation is pure scatter-add (sum, outer-product sum, count per slot);
finalize computes mean/cov/icov in closed form (no LAPACK) on the VPU.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geom import fit
from .voxel_grid import GridConfig, _claim_loop, _fingerprint, _hash3, _probe_match_fp, point_to_voxel


class GaussianVoxelMap(NamedTuple):
    keys: jnp.ndarray      # int32 (3, C)
    fp: jnp.ndarray        # uint32 (C,)
    occupied: jnp.ndarray  # bool (C,)
    sum: jnp.ndarray       # (3, C) point sums
    sq: jnp.ndarray        # (6, C) outer-product sums [xx, xy, xz, yy, yz, zz]
    count: jnp.ndarray     # (C,)
    mean: jnp.ndarray      # (3, C) — valid after finalize
    icov: jnp.ndarray      # (6, C) inverse covariance (symmetric) — after finalize
    cov: jnp.ndarray       # (6, C) regularized covariance — after finalize
    valid: jnp.ndarray     # bool (C,) enough points + well-conditioned


def create(config: GridConfig, dtype=jnp.float32) -> GaussianVoxelMap:
    C = config.capacity
    return GaussianVoxelMap(
        keys=jnp.zeros((3, C), jnp.int32),
        fp=jnp.zeros((C,), jnp.uint32),
        occupied=jnp.zeros((C,), bool),
        sum=jnp.zeros((3, C), dtype),
        sq=jnp.zeros((6, C), dtype),
        count=jnp.zeros((C,), dtype),
        mean=jnp.zeros((3, C), dtype),
        icov=jnp.zeros((6, C), dtype),
        cov=jnp.zeros((6, C), dtype),
        valid=jnp.zeros((C,), bool),
    )


@functools.partial(jax.jit, static_argnames=("config",))
def accumulate(config: GridConfig, g: GaussianVoxelMap, points: jnp.ndarray, mask: jnp.ndarray) -> GaussianVoxelMap:
    """Scatter masked points (3, N) into the per-voxel first/second moments."""
    C = config.capacity
    coords = point_to_voxel(points, config.resolution)
    cx, cy, cz = coords[0], coords[1], coords[2]
    counter = jnp.ones((), jnp.int32)
    stamp0 = jnp.zeros((C,), jnp.int32)
    fp, _, _, slot = _claim_loop(config, g.fp, stamp0, counter, cx, cy, cz, mask)

    tgt = jnp.where(mask & (slot < C), slot, C)
    keys = g.keys.at[0, tgt].set(cx, mode="drop")
    keys = keys.at[1, tgt].set(cy, mode="drop")
    keys = keys.at[2, tgt].set(cz, mode="drop")
    occupied = g.occupied.at[tgt].set(True, mode="drop")
    x, y, z = points[0], points[1], points[2]
    s = g.sum.at[0, tgt].add(x, mode="drop").at[1, tgt].add(y, mode="drop").at[2, tgt].add(z, mode="drop")
    sq = g.sq
    sq = sq.at[0, tgt].add(x * x, mode="drop")
    sq = sq.at[1, tgt].add(x * y, mode="drop")
    sq = sq.at[2, tgt].add(x * z, mode="drop")
    sq = sq.at[3, tgt].add(y * y, mode="drop")
    sq = sq.at[4, tgt].add(y * z, mode="drop")
    sq = sq.at[5, tgt].add(z * z, mode="drop")
    count = g.count.at[tgt].add(1.0, mode="drop")
    return g._replace(keys=keys, fp=fp, occupied=occupied, sum=s, sq=sq, count=count)


@functools.partial(jax.jit, static_argnames=("config", "mode", "min_points"))
def finalize(config: GridConfig, g: GaussianVoxelMap, mode: str = "ndt", min_points: int = 6,
             eig_mult: float = 0.01) -> GaussianVoxelMap:
    """Compute mean / regularized covariance / inverse covariance per voxel.

    mode="ndt": inflate small eigenvalues to eig_mult * lambda_max
      (voxel_grid_covariance_omp_impl.hpp semantics, min_points gating).
    mode="plane": VGICP/GICP PLANE regularization — eigenvalues replaced by
      (1, 1, 1e-3) in the eigenbasis (fast_gicp_impl.hpp:241-298).
    """
    cnt = g.count
    ok_n = cnt >= min_points
    inv_n = 1.0 / jnp.maximum(cnt, 1.0)
    mx, my, mz = g.sum[0] * inv_n, g.sum[1] * inv_n, g.sum[2] * inv_n
    # cov = E[pp^T] - mu mu^T  (population covariance; the reference divides by
    # (n-1) for NDT — match that for ndt mode)
    denom = jnp.maximum(cnt - 1.0, 1.0) if mode == "ndt" else jnp.maximum(cnt, 1.0)
    c00 = (g.sq[0] - g.sum[0] * mx) / denom
    c01 = (g.sq[1] - g.sum[0] * my) / denom
    c02 = (g.sq[2] - g.sum[0] * mz) / denom
    c11 = (g.sq[3] - g.sum[1] * my) / denom
    c12 = (g.sq[4] - g.sum[1] * mz) / denom
    c22 = (g.sq[5] - g.sum[2] * mz) / denom

    vals, vecs = fit.eigh3x3_soa(c00, c01, c02, c11, c12, c22)
    lmin, lmid, lmax = vals[0], vals[1], vals[2]
    well = lmax > 1e-9
    if mode == "ndt":
        floor = eig_mult * jnp.maximum(lmax, 1e-9)
        l0 = jnp.maximum(lmin, floor)
        l1 = jnp.maximum(lmid, floor)
        l2 = jnp.maximum(lmax, 1e-9)
    else:  # plane
        scale = jnp.maximum(lmax, 1e-9)
        l0 = 1e-3 * scale
        l1 = 1.0 * scale
        l2 = 1.0 * scale

    # rebuild cov = V diag(l) V^T and icov = V diag(1/l) V^T from components
    def rebuild(l0, l1, l2):
        outs = []
        comps = [(0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2)]
        for (i, j) in comps:
            outs.append(l0 * vecs[0, i] * vecs[0, j] + l1 * vecs[1, i] * vecs[1, j] + l2 * vecs[2, i] * vecs[2, j])
        return jnp.stack(outs, axis=0)

    cov = rebuild(l0, l1, l2)
    icov = rebuild(1.0 / jnp.maximum(l0, 1e-12), 1.0 / jnp.maximum(l1, 1e-12), 1.0 / jnp.maximum(l2, 1e-12))
    valid = g.occupied & ok_n & well
    return g._replace(mean=jnp.stack([mx, my, mz]), cov=cov, icov=icov, valid=valid)


def build(config: GridConfig, points: jnp.ndarray, mask: jnp.ndarray, mode: str = "ndt", min_points: int = 6) -> GaussianVoxelMap:
    g = create(config, points.dtype)
    g = accumulate(config, g, points, mask)
    return finalize(config, g, mode=mode, min_points=min_points)


def probe(config: GridConfig, g: GaussianVoxelMap, coords3: tuple) -> jnp.ndarray:
    """Slot per query voxel coord (component arrays), -1 if absent."""
    return _probe_match_fp(config, g.fp, coords3[0], coords3[1], coords3[2])


class BakedGaussianMap(NamedTuple):
    """Stencil-baked Gaussian map: ONE slot lookup returns every stencil
    neighbor's statistics.

    The NDT/VGICP score sums over all `nearby` stencil voxels per query
    (ndt_omp `getNeighborhoodAtPoint*`, fast_vgicp DIRECT modes), so the
    query-time stencil costs S wide gathers per search pass. TPU gathers are
    row-rate-bound, so the same insert-time trick as the point map's baked
    mode (GridConfig.baked) applies: every occupied voxel writes its
    (mean, icov, cov) into the slot of EACH query voxel whose stencil
    contains it — entry index = stencil-offset index, so the layout needs no
    in-slot ordering and collisions are impossible (at most one voxel per
    (query voxel, offset) pair). A query is then one fingerprint probe plus
    one (S*10, C) column gather instead of S separate probe+gathers.
    """

    fp: jnp.ndarray       # uint32 (C,) fingerprint of the QUERY voxel, 0 = empty
    entries: jnp.ndarray  # (S, 10, C): [valid, mean(3), icov(6)] per stencil entry
    covs: jnp.ndarray     # (S, 6, C): regularized covariance (VGICP/D2D consumers)
    counts: jnp.ndarray   # (S, C): per-entry point count (VGICP sqrt-count weight)
    dropped: jnp.ndarray  # () int32: (voxel, offset) entries lost to capacity overflow


@functools.partial(jax.jit, static_argnames=("config", "baked_config"))
def bake(config: GridConfig, g: GaussianVoxelMap, baked_config: GridConfig) -> BakedGaussianMap:
    """Expand a finalized GaussianVoxelMap into its stencil-baked form.

    `baked_config` sizes the baked table (capacity >= the number of voxels
    covered by any stencil neighborhood, i.e. up to `nearby` x occupied; its
    `nearby` selects the stencil). One-time build cost: S x capacity claim
    rounds + scatters — amortized over every search pass of every alignment
    against this target (NDT targets are built once per map/tile)."""
    from .voxel_grid import stencil_offsets

    C = config.capacity
    C2 = baked_config.capacity
    offs = stencil_offsets(baked_config.nearby)  # (S, 3)
    S = len(offs)
    dtype = g.mean.dtype

    fp2 = jnp.zeros((C2,), jnp.uint32)
    stamp0 = jnp.zeros((C2,), jnp.int32)
    counter = jnp.ones((), jnp.int32)
    entries = jnp.zeros((S, 10, C2), dtype)
    covs = jnp.zeros((S, 6, C2), dtype)
    counts = jnp.zeros((S, C2), dtype)
    stats = jnp.concatenate(
        [jnp.ones((1, C), dtype), g.mean, g.icov], axis=0
    )  # (10, C) with the valid flag leading
    valid = g.valid
    dropped = jnp.zeros((), jnp.int32)
    for s, (ox, oy, oz) in enumerate(offs.tolist()):
        # occupied voxel u fills entry s of query voxel v = u - offs[s]
        cx, cy, cz = g.keys[0] - ox, g.keys[1] - oy, g.keys[2] - oz
        fp2, _, _, slot = _claim_loop(baked_config, fp2, stamp0, counter, cx, cy, cz, valid)
        tgt = jnp.where(valid & (slot < C2), slot, C2)
        dropped = dropped + jnp.sum((valid & (slot >= C2)).astype(jnp.int32))
        for r in range(10):
            entries = entries.at[s, r, tgt].set(jnp.where(valid, stats[r], 0.0), mode="drop")
        for r in range(6):
            covs = covs.at[s, r, tgt].set(jnp.where(valid, g.cov[r], 0.0), mode="drop")
        counts = counts.at[s, tgt].set(jnp.where(valid, g.count, 0.0), mode="drop")
    return BakedGaussianMap(fp=fp2, entries=entries, covs=covs, counts=counts, dropped=dropped)


def baked_probe(baked_config: GridConfig, bmap: BakedGaussianMap, coords: jnp.ndarray,
                rows: jnp.ndarray) -> tuple:
    """One fingerprint probe + ONE wide column gather over a baked map.

    coords (3, N) integer query-voxel coords; `rows` (S, R, C) — the
    per-entry rows the caller wants gathered (e.g. bmap.entries, or a
    concat of entries/counts/covs). Returns (ent (S, R, N), found (N,)).
    The single shared implementation of the baked lookup used by NDT P2D,
    NDT D2D and VGICP."""
    from .voxel_grid import _fingerprint, _hash3

    C, P = baked_config.capacity, baked_config.probe
    S, R = rows.shape[0], rows.shape[1]
    N = coords.shape[1]
    h0 = _hash3(coords[0], coords[1], coords[2], C)
    fpq = _fingerprint(coords[0], coords[1], coords[2])
    tblfp = jnp.stack([jnp.roll(bmap.fp, -j) for j in range(P)], axis=0)  # (P, C)
    gfp = tblfp[:, h0]
    match = gfp == fpq[None, :]
    found = jnp.any(match, axis=0)
    jm = jnp.argmax(match, axis=0).astype(jnp.int32)
    safe = (h0 + jm) & (C - 1)
    ent = rows.reshape(S * R, C)[:, safe].reshape(S, R, N)  # ONE column gather
    return ent, found
