"""Point-level Generalized-ICP (distribution-to-distribution, single NN).

Behavioral parity target (math re-derived, batched):
  reference `fast_gicp/include/fast_gicp/gicp/fast_gicp.hpp` +
  `impl/fast_gicp_impl.hpp`:
  - per-point covariances from k-NN with PLANE regularization on BOTH clouds
    (`calculate_covariances` :241-298),
  - single nearest-neighbor correspondences with a max-distance gate
    (`update_correspondences` :115-152),
  - per-pair mahalanobis (C_tgt + T C_src T^T)^-1 in the weighted GN
    linearization (`linearize` :155-211),
  and `gicp_omp.h` (the pclomp OpenMP fork) for defaults.

The target's per-point covariances live in a flat attribute array parallel to
the voxel map's point blocks (joined through kNN indices) — the TPU version of
the reference's kd-tree index identity.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .. import ops
from ..geom import se3
from . import solver
from .vgicp import _sym_inv3, source_covariances


@dataclasses.dataclass(frozen=True)
class GICPConfig:
    k_correspondences: int = 8        # ref default 20; 8 covers planar scenes
    max_corr_dist: float = 2.0        # correspondence gate
    cov_resolution: float = 1.0       # k-NN grid resolution for covariances
    cov_method: str = "voxel"         # "voxel" (approx) | "exact" (Pallas MXU brute-force)
    search_every: int = 2
    solver: solver.SolverConfig = dataclasses.field(
        default_factory=lambda: solver.SolverConfig(max_iterations=40)
    )


class GICPResult(NamedTuple):
    pose: se3.Pose
    converged: jnp.ndarray
    iterations: jnp.ndarray
    error: jnp.ndarray
    H: jnp.ndarray


def build_target(cfg: GICPConfig, target: jnp.ndarray, mask: Optional[jnp.ndarray] = None, capacity: int = 1 << 15):
    """Voxel map of the target + flat per-point covariance attribute array."""
    if mask is None:
        mask = jnp.ones(target.shape[1], bool)
    grid_cfg = ops.GridConfig(capacity=capacity, pts_per_voxel=8, resolution=cfg.cov_resolution, nearby=7)
    grid, flat_idx = ops.insert(grid_cfg, ops.create(grid_cfg, target.dtype), target, mask, return_indices=True)
    covs = source_covariances(target, mask, k=cfg.k_correspondences, resolution=cfg.cov_resolution,
                              method=cfg.cov_method)
    C, K = grid_cfg.capacity, grid_cfg.pts_per_voxel
    att = jnp.zeros((6, K * C), target.dtype)
    tgt = jnp.where(flat_idx >= 0, flat_idx, K * C)
    for c in range(6):
        att = att.at[c, tgt].set(covs[c], mode="drop")
    return grid_cfg, grid, att


def _linearize(cfg, grid_cfg, grid, tgt_cov_flat, src, src_cov, mask, pose, cache, do_search):
    pw = pose.apply(src)

    def search():
        nbrs, d2, cnt, idx = ops.knn(grid_cfg, grid, pw, k=1, max_range=cfg.max_corr_dist)
        ok = (cnt > 0) & mask
        return nbrs[:, 0, :], jnp.maximum(idx[0], 0), ok

    if cache is None:
        nn, nn_idx, ok = search()
    else:
        nn, nn_idx, ok = jax.lax.cond(do_search, search, lambda: cache)
    cache_new = (nn, nn_idx, ok)

    R = pose.R
    s00, s01, s02, s11, s12, s22 = (src_cov[c] for c in range(6))
    rc = [
        [R[i, 0] * [s00, s01, s02][j] + R[i, 1] * [s01, s11, s12][j] + R[i, 2] * [s02, s12, s22][j] for j in range(3)]
        for i in range(3)
    ]
    t00 = rc[0][0] * R[0, 0] + rc[0][1] * R[0, 1] + rc[0][2] * R[0, 2]
    t01 = rc[0][0] * R[1, 0] + rc[0][1] * R[1, 1] + rc[0][2] * R[1, 2]
    t02 = rc[0][0] * R[2, 0] + rc[0][1] * R[2, 1] + rc[0][2] * R[2, 2]
    t11 = rc[1][0] * R[1, 0] + rc[1][1] * R[1, 1] + rc[1][2] * R[1, 2]
    t12 = rc[1][0] * R[2, 0] + rc[1][1] * R[2, 1] + rc[1][2] * R[2, 2]
    t22 = rc[2][0] * R[2, 0] + rc[2][1] * R[2, 1] + rc[2][2] * R[2, 2]

    g00 = tgt_cov_flat[0, nn_idx] + t00
    g01 = tgt_cov_flat[1, nn_idx] + t01
    g02 = tgt_cov_flat[2, nn_idx] + t02
    g11 = tgt_cov_flat[3, nn_idx] + t11
    g12 = tgt_cov_flat[4, nn_idx] + t12
    g22 = tgt_cov_flat[5, nn_idx] + t22
    m00, m01, m02, m11, m12, m22 = _sym_inv3(g00, g01, g02, g11, g12, g22)

    w = ok.astype(src.dtype)
    px, py, pz = pw[0], pw[1], pw[2]
    qx = px - nn[0]
    qy = py - nn[1]
    qz = pz - nn[2]
    rx = m00 * qx + m01 * qy + m02 * qz
    ry = m01 * qx + m11 * qy + m12 * qz
    rz = m02 * qx + m12 * qy + m22 * qz
    err = jnp.sum(w * (qx * rx + qy * ry + qz * rz))

    zero = px * 0
    one = zero + 1.0
    cols = [(zero, -pz, py), (pz, zero, -px), (-py, px, zero), (one, zero, zero), (zero, one, zero), (zero, zero, one)]
    mj = []
    for (ax, ay, az) in cols:
        mj.append((m00 * ax + m01 * ay + m02 * az, m01 * ax + m11 * ay + m12 * az, m02 * ax + m12 * ay + m22 * az))
    H = jnp.zeros((6, 6), src.dtype)
    b = jnp.zeros((6,), src.dtype)
    for i in range(6):
        ai = cols[i]
        b = b.at[i].add(jnp.sum(w * (ai[0] * rx + ai[1] * ry + ai[2] * rz)))
        for j in range(i, 6):
            hij = jnp.sum(w * (ai[0] * mj[j][0] + ai[1] * mj[j][1] + ai[2] * mj[j][2]))
            H = H.at[i, j].add(hij)
            H = H.at[j, i].add(jnp.where(i == j, 0.0, hij))
    return H, b, err, cache_new


@functools.partial(jax.jit, static_argnames=("grid_cfg", "cfg"))
def align(
    grid_cfg: ops.GridConfig,
    grid: ops.VoxelHashMap,
    target_cov_flat: jnp.ndarray,
    source: jnp.ndarray,
    source_cov: jnp.ndarray,
    source_mask: Optional[jnp.ndarray] = None,
    init_pose: Optional[se3.Pose] = None,
    cfg: GICPConfig = GICPConfig(),
) -> GICPResult:
    if source_mask is None:
        source_mask = jnp.ones(source.shape[1], bool)
    if init_pose is None:
        init_pose = se3.identity(source.dtype)
    scfg = cfg.solver
    dtype = source.dtype
    N = source.shape[1]

    def body(carry, it):
        pose, done, iters, cache, big = carry
        do_search = ((it % cfg.search_every == 0) | big) & ~done
        H, b, err, cache = _linearize(
            cfg, grid_cfg, grid, target_cov_flat, source, source_cov, source_mask, pose, cache, do_search
        )
        lam = 1e-6 * jnp.max(jnp.abs(jnp.diag(H)))
        d = solver._solve_step(H, b, lam, solver.inline_projection(H, scfg.degeneracy_threshold))
        conv = solver._converged(d, scfg)
        pose_new = se3.retract_left(pose, d)
        pose = jax.tree.map(lambda a, bb: jnp.where(done, a, bb), pose, pose_new)
        iters = iters + jnp.where(done, 0, 1)
        done = done | conv
        big = (jnp.max(jnp.abs(d[:3])) > 0.02) | (jnp.max(jnp.abs(d[3:])) > 0.05)
        return (pose, done, iters, cache, big), err

    zero_s = jnp.sum(init_pose.t) * 0
    zero_n = jnp.sum(source) * 0
    cache0 = (
        jnp.zeros((3, N), dtype) + zero_n,
        jnp.zeros((N,), jnp.int32) + zero_n.astype(jnp.int32),
        jnp.zeros((N,), bool) | (zero_n > 1.0),
    )
    init = (init_pose, zero_s > 1.0, zero_s.astype(jnp.int32), cache0, zero_s > 1.0)
    (pose, done, iters, cache, _), errs = jax.lax.scan(body, init, jnp.arange(scfg.max_iterations, dtype=jnp.int32))
    H, b, err, _ = _linearize(
        cfg, grid_cfg, grid, target_cov_flat, source, source_cov, source_mask, pose, cache, jnp.asarray(False)
    )
    return GICPResult(pose, done, iters, err, H)
