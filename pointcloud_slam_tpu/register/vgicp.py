"""Voxelized GICP (VGICP) — distribution-to-distribution-ish registration.

Behavioral parity target (math re-derived, batched):
  reference `fast_gicp/include/fast_gicp/gicp/fast_vgicp.hpp` +
  `impl/fast_vgicp_impl.hpp` and the CUDA core
  (`src/fast_gicp/cuda/fast_vgicp_cuda.cu`, `compute_derivatives.cu`):
  - target = Gaussian voxel map (additive accumulation),
  - one correspondence per (source point, stencil offset) hit
    (fast_vgicp_impl.hpp:82-99, DIRECT1/7/27),
  - per-correspondence mahalanobis M = (C_voxel + T C_src T^T)^-1 and
    weight w = sqrt(voxel num_points) applied to error/H/b
    (fast_vgicp_impl.hpp:149-163),
  - source covariances from k-NN with PLANE regularization
    (fast_gicp_impl.hpp:241-298).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .. import ops
from ..ops import gaussian_grid as gg
from ..geom import fit, se3
from . import solver


@dataclasses.dataclass(frozen=True)
class VGICPConfig:
    resolution: float = 1.0
    k_correspondences: int = 8       # source covariance k-NN (ref default 20)
    min_points_per_voxel: int = 4
    nearby: int = 7                  # voxel_search_method DIRECT1/7/27
    search_every: int = 3
    solver: solver.SolverConfig = dataclasses.field(
        default_factory=lambda: solver.SolverConfig(max_iterations=35)
    )


class VGICPResult(NamedTuple):
    pose: se3.Pose
    converged: jnp.ndarray
    iterations: jnp.ndarray
    error: jnp.ndarray
    H: jnp.ndarray


def _plane_regularize(c00, c01, c02, c11, c12, c22, ok):
    """PLANE regularization: eigenvalues -> (1e-3, 1, 1) * lambda_max in the
    eigenbasis (fast_gicp_impl.hpp:241-298); degenerate points fall back to a
    small isotropic covariance. Returns (6, N)."""
    vals, vecs = fit.eigh3x3_soa(c00, c01, c02, c11, c12, c22)
    scale = jnp.maximum(vals[2], 1e-9)
    l = (1e-3 * scale, scale, scale)
    comps = [(0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2)]
    out = [l[0] * vecs[0, i] * vecs[0, j] + l[1] * vecs[1, i] * vecs[1, j] + l[2] * vecs[2, i] * vecs[2, j] for (i, j) in comps]
    cov = jnp.stack(out, axis=0)
    iso = jnp.stack([jnp.ones_like(c00), jnp.zeros_like(c00), jnp.zeros_like(c00), jnp.ones_like(c00), jnp.zeros_like(c00), jnp.ones_like(c00)], axis=0) * 1e-2
    return jnp.where(ok[None, :], cov, iso)


def source_covariances(points: jnp.ndarray, mask: jnp.ndarray, k: int = 8, resolution: float = 1.0,
                       method: str = "voxel"):
    """Per-point PLANE-regularized covariances from k-NN within the cloud
    (fast_gicp calculate_covariances). Returns (6, N) [xx,xy,xz,yy,yz,zz].

    method="voxel": approximate k-NN over a stencil-7 voxel grid (bounded
    radius 2*resolution — the TPU-default trade).
    method="exact": EXACT brute-force k-NN on the MXU via the Pallas tiled
    distance-matrix kernel — the counterpart of the reference's GPU
    `brute_force_knn.cu` -> `covariance_estimation.cu` path (unbounded
    radius, exactly k neighbors, the kd-tree/CUDA semantics)."""
    if method == "exact":
        from ..ops.pallas import bf_knn

        N = points.shape[1]
        q = bf_knn.pad_cloud(points, mask, 256)
        db = bf_knn.pad_cloud(points, mask, 512)
        d2, idx = bf_knn.knn(q, db, k=k)
        d2, idx = d2[:, :N], idx[:, :N]          # (k, N) drop query padding
        nbrs = db[:, idx]                        # (3, k, N)
        nmask = d2 < 1.0e30                      # padded/masked neighbors are far
        cnt = jnp.sum(nmask, axis=0).astype(jnp.int32)
    else:
        cfg = ops.GridConfig(
            capacity=max(1 << 14, 1 << (int(points.shape[1]).bit_length())),
            pts_per_voxel=8,
            resolution=resolution,
            nearby=7,
        )
        grid = ops.insert(cfg, ops.create(cfg, points.dtype), points, mask)
        nbrs, d2, cnt, _ = ops.knn(cfg, grid, points, k=k, max_range=2.0 * resolution)
        nmask = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 0) < cnt[None, :]
    m = nmask.astype(points.dtype)
    n = jnp.maximum(jnp.sum(m, axis=0), 1.0)
    mx = jnp.sum(nbrs[0] * m, axis=0) / n
    my = jnp.sum(nbrs[1] * m, axis=0) / n
    mz = jnp.sum(nbrs[2] * m, axis=0) / n
    dx = (nbrs[0] - mx[None]) * m
    dy = (nbrs[1] - my[None]) * m
    dz = (nbrs[2] - mz[None]) * m
    c00 = jnp.sum(dx * dx, axis=0) / n
    c01 = jnp.sum(dx * dy, axis=0) / n
    c02 = jnp.sum(dx * dz, axis=0) / n
    c11 = jnp.sum(dy * dy, axis=0) / n
    c12 = jnp.sum(dy * dz, axis=0) / n
    c22 = jnp.sum(dz * dz, axis=0) / n
    return _plane_regularize(c00, c01, c02, c11, c12, c22, cnt >= 3)


@functools.partial(jax.jit, static_argnames=("resolution", "kernel_width", "capacity"))
def source_covariances_rbf(points: jnp.ndarray, mask: jnp.ndarray, resolution: float = 1.0,
                           kernel_width: float = 0.5, capacity: int = 1 << 14):
    """RBF-kernel covariance estimation — the reference's FASTEST VGICP mode
    (covariance_estimation_rbf.cu, 5.92 ms in fast_gicp/README.md:123).

    TPU formulation: one pass accumulates per-voxel first/second moments
    (scatter-add), then each point blends the moments of its stencil-7 voxel
    neighborhood with Gaussian weights w_v = exp(-||p - mean_v||^2 / (2 w^2))
    — the reference weights individual neighbor points by the same kernel;
    at voxel granularity the blended moments are the kernel-weighted
    covariance of the same neighborhood. PLANE regularization as in the k-NN
    path. Returns (6, N)."""
    cfg = ops.GridConfig(capacity=capacity, resolution=resolution, nearby=7)
    g = gg.accumulate(cfg, gg.create(cfg, points.dtype), points, mask)
    coords = ops.point_to_voxel(points, resolution)
    px, py, pz = points[0], points[1], points[2]
    inv2w2 = 1.0 / (2.0 * kernel_width * kernel_width)

    W = px * 0
    Sx = px * 0
    Sy = px * 0
    Sz = px * 0
    Q = [px * 0 for _ in range(6)]
    for (ox, oy, oz) in ops.stencil_offsets(7).tolist():
        slot = gg.probe(cfg, g, (coords[0] + ox, coords[1] + oy, coords[2] + oz))
        safe = jnp.maximum(slot, 0)
        cnt = jnp.where(slot >= 0, g.count[safe], 0.0)
        inv_n = 1.0 / jnp.maximum(cnt, 1.0)
        mx = g.sum[0, safe] * inv_n
        my = g.sum[1, safe] * inv_n
        mz = g.sum[2, safe] * inv_n
        d2 = (px - mx) ** 2 + (py - my) ** 2 + (pz - mz) ** 2
        w = jnp.where(cnt > 0, jnp.exp(-d2 * inv2w2), 0.0)
        W = W + w * cnt
        Sx = Sx + w * g.sum[0, safe]
        Sy = Sy + w * g.sum[1, safe]
        Sz = Sz + w * g.sum[2, safe]
        for c in range(6):
            Q[c] = Q[c] + w * g.sq[c, safe]
    invW = 1.0 / jnp.maximum(W, 1e-9)
    mx, my, mz = Sx * invW, Sy * invW, Sz * invW
    c00 = Q[0] * invW - mx * mx
    c01 = Q[1] * invW - mx * my
    c02 = Q[2] * invW - mx * mz
    c11 = Q[3] * invW - my * my
    c12 = Q[4] * invW - my * mz
    c22 = Q[5] * invW - mz * mz
    return _plane_regularize(c00, c01, c02, c11, c12, c22, mask & (W >= 3.0))


def build_target(cfg: VGICPConfig, target: jnp.ndarray, mask: Optional[jnp.ndarray] = None, capacity: int = 1 << 16,
                 baked: bool = False, baked_capacity: Optional[int] = None):
    """Target Gaussian voxel map. baked=True expands it with gg.bake so every
    linearization pass (VGICP re-searches each iteration) does ONE probe +
    ONE wide gather instead of `nearby` probe+gathers — identical results."""
    if mask is None:
        mask = jnp.ones(target.shape[1], bool)
    grid_cfg = ops.GridConfig(capacity=capacity, resolution=cfg.resolution, nearby=cfg.nearby)
    g = gg.build(grid_cfg, target, mask, mode="plane", min_points=cfg.min_points_per_voxel)
    if not baked:
        return grid_cfg, g
    baked_cfg = ops.GridConfig(
        capacity=baked_capacity or 4 * capacity, resolution=cfg.resolution, nearby=cfg.nearby
    )
    from .ndt import _check_bake_coverage

    baked_map = gg.bake(grid_cfg, g, baked_cfg)
    _check_bake_coverage(baked_map, baked_cfg)
    return baked_cfg, baked_map


def _sym_inv3(a00, a01, a02, a11, a12, a22):
    """Closed-form inverse of symmetric 3x3 component arrays."""
    i00 = a11 * a22 - a12 * a12
    i01 = a02 * a12 - a01 * a22
    i02 = a01 * a12 - a02 * a11
    i11 = a00 * a22 - a02 * a02
    i12 = a01 * a02 - a00 * a12
    i22 = a00 * a11 - a01 * a01
    det = a00 * i00 + a01 * i01 + a02 * i02
    inv = 1.0 / jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    return i00 * inv, i01 * inv, i02 * inv, i11 * inv, i12 * inv, i22 * inv


def _src_cov_world(src_cov, R):
    """T C_src T^T per point (6 components)."""
    s00, s01, s02, s11, s12, s22 = (src_cov[c] for c in range(6))
    rc = [[R[i, 0] * [s00, s01, s02][j] + R[i, 1] * [s01, s11, s12][j] + R[i, 2] * [s02, s12, s22][j] for j in range(3)] for i in range(3)]
    t00 = rc[0][0] * R[0, 0] + rc[0][1] * R[0, 1] + rc[0][2] * R[0, 2]
    t01 = rc[0][0] * R[1, 0] + rc[0][1] * R[1, 1] + rc[0][2] * R[1, 2]
    t02 = rc[0][0] * R[2, 0] + rc[0][1] * R[2, 1] + rc[0][2] * R[2, 2]
    t11 = rc[1][0] * R[1, 0] + rc[1][1] * R[1, 1] + rc[1][2] * R[1, 2]
    t12 = rc[1][0] * R[2, 0] + rc[1][1] * R[2, 1] + rc[1][2] * R[2, 2]
    t22 = rc[2][0] * R[2, 0] + rc[2][1] * R[2, 1] + rc[2][2] * R[2, 2]
    return t00, t01, t02, t11, t12, t22


def _offset_terms(H, b, err, px, py, pz, ok, cnt, meanx, meany, meanz, cov6, t6):
    """Accumulate one stencil offset's weighted mahalanobis H/b/err terms."""
    t00, t01, t02, t11, t12, t22 = t6
    w = jnp.where(ok, jnp.sqrt(jnp.maximum(cnt, 1.0)), 0.0)
    qx = px - meanx
    qy = py - meany
    qz = pz - meanz
    # M = (C_voxel + T C_src T^T)^-1
    m00, m01, m02, m11, m12, m22 = _sym_inv3(
        cov6[0] + t00, cov6[1] + t01, cov6[2] + t02,
        cov6[3] + t11, cov6[4] + t12, cov6[5] + t22,
    )
    rx = m00 * qx + m01 * qy + m02 * qz  # M q
    ry = m01 * qx + m11 * qy + m12 * qz
    rz = m02 * qx + m12 * qy + m22 * qz
    err = err + jnp.sum(w * (qx * rx + qy * ry + qz * rz))
    # J columns (dq/d[omega, v]): -hat(pw) | I
    cols = [
        (qx * 0, -pz, py),
        (pz, qx * 0, -px),
        (-py, px, qx * 0),
        (qx * 0 + 1.0, qx * 0, qx * 0),
        (qx * 0, qx * 0 + 1.0, qx * 0),
        (qx * 0, qx * 0, qx * 0 + 1.0),
    ]
    mj = []
    for (ax, ay, az) in cols:
        mj.append((m00 * ax + m01 * ay + m02 * az, m01 * ax + m11 * ay + m12 * az, m02 * ax + m12 * ay + m22 * az))
    for i in range(6):
        ai = cols[i]
        b = b.at[i].add(jnp.sum(w * (ai[0] * rx + ai[1] * ry + ai[2] * rz)))
        for j in range(i, 6):
            hij = jnp.sum(w * (ai[0] * mj[j][0] + ai[1] * mj[j][1] + ai[2] * mj[j][2]))
            H = H.at[i, j].add(hij)
            H = H.at[j, i].add(jnp.where(i == j, 0.0, hij))
    return H, b, err


@functools.partial(jax.jit, static_argnames=("grid_cfg", "cfg"))
def align(
    grid_cfg: ops.GridConfig,
    target: gg.GaussianVoxelMap,
    source: jnp.ndarray,
    source_cov: jnp.ndarray,
    source_mask: Optional[jnp.ndarray] = None,
    init_pose: Optional[se3.Pose] = None,
    cfg: VGICPConfig = VGICPConfig(),
) -> VGICPResult:
    """Align source (3, N) with per-point covariances (6, N) to the voxel map.

    Cached-search rounds (round 5): the voxel correspondence (one slot per
    (source point, stencil offset)) is searched once per `search_every`
    iterations and its statistics (ok, count, mean, cov) cached; between
    searches each GN iteration recomputes the EXACT mahalanobis terms from
    the cache — M depends on the pose through T C_src T^T, which is fresh
    every iteration, so only the correspondence set is ever stale (the same
    cadence semantics as icp_loop / ndt.align). Previously every iteration
    paid the full stencil probe+gather: 35 x S passes made a 17k-pt pairwise
    align ~640 ms; cached+baked it is ~10-25 ms device."""
    if source_mask is None:
        source_mask = jnp.ones(source.shape[1], bool)
    if init_pose is None:
        init_pose = se3.identity(source.dtype)
    scfg = cfg.solver
    dtype = source.dtype
    S = ops.stencil_offsets(cfg.nearby).shape[0]
    N = source.shape[1]
    baked = isinstance(target, gg.BakedGaussianMap)
    offsets = ops.stencil_offsets(cfg.nearby)

    def search(pose):
        """-> cache (ok (S,N), cnt (S,N), mean (3,S,N), cov (6,S,N))."""
        pw = pose.apply(source)
        coords = ops.point_to_voxel(pw, cfg.resolution)
        if baked:
            packed = jnp.concatenate(
                [target.entries[:, 0:1], target.counts[:, None, :],
                 target.entries[:, 1:4], target.covs], axis=1,
            )                                            # (S, 11, C)
            ent, found = gg.baked_probe(grid_cfg, target, coords, packed)
            ok = (ent[:, 0] > 0.5) & found[None, :] & source_mask[None, :]
            return ok, ent[:, 1], ent[:, 2:5].swapaxes(0, 1), ent[:, 5:11].swapaxes(0, 1)
        oks, cnts, means, covs = [], [], [], []
        for (ox, oy, oz) in offsets.tolist():
            slot = gg.probe(grid_cfg, target, (coords[0] + ox, coords[1] + oy, coords[2] + oz))
            safe = jnp.maximum(slot, 0)
            oks.append((slot >= 0) & target.valid[safe] & source_mask)
            cnts.append(target.count[safe])
            means.append(target.mean[:, safe])
            covs.append(target.cov[:, safe])
        return (jnp.stack(oks), jnp.stack(cnts),
                jnp.stack(means, axis=1), jnp.stack(covs, axis=1))

    def body(carry, it):
        pose, done, iters, cache = carry
        ok, cnt, mean, cov = cache
        pw = pose.apply(source)
        t6 = _src_cov_world(source_cov, pose.R)
        H = jnp.zeros((6, 6), dtype)
        b = jnp.zeros((6,), dtype)
        err = jnp.zeros((), dtype)
        # ONE vectorized pass over the whole (S, N) correspondence set —
        # _offset_terms is elementwise + full reductions, so (S, N) operands
        # produce identical sums to the per-offset loop
        H, b, err = _offset_terms(
            H, b, err, pw[0], pw[1], pw[2], ok, cnt,
            mean[0], mean[1], mean[2], [cov[c] for c in range(6)], t6,
        )
        lam = 1e-6 * jnp.max(jnp.abs(jnp.diag(H)))
        d = solver._solve_step(H, b, lam, solver.inline_projection(H, scfg.degeneracy_threshold))
        conv = solver._converged(d, scfg)
        pose_new = se3.retract_left(pose, d)
        pose = jax.tree.map(lambda a, bb: jnp.where(done, a, bb), pose, pose_new)
        iters = iters + jnp.where(done, 0, 1)
        done = done | conv
        return (pose, done, iters, cache), (err, H)

    def round_body(chunk):
        def rb(carry, _):
            pose, done, iters, _cache = carry
            cache = search(pose)
            done = done | (iters >= scfg.max_iterations)
            carry, _ = jax.lax.scan(
                body, (pose, done, iters, cache), jnp.arange(chunk, dtype=jnp.int32)
            )
            return carry, None
        return rb

    zero_s = jnp.sum(init_pose.t) * 0
    zero_n = jnp.sum(source) * 0
    cache0 = (
        jnp.zeros((S, N), bool) | (zero_n > 1.0),
        jnp.zeros((S, N), dtype) + zero_n,
        jnp.zeros((3, S, N), dtype) + zero_n,
        jnp.zeros((6, S, N), dtype) + zero_n,
    )
    carry = (init_pose, zero_s > 1.0, zero_s.astype(jnp.int32), cache0)
    every = max(1, cfg.search_every)
    n_rounds = -(-scfg.max_iterations // every)
    carry, _ = jax.lax.scan(round_body(every), carry, None, length=n_rounds)
    pose, done, iters, cache = carry
    # final terms at the converged pose (error + Hessian report)
    _, _, _, cache = carry
    ok, cnt, mean, cov = cache
    t6 = _src_cov_world(source_cov, pose.R)
    pw = pose.apply(source)
    H = jnp.zeros((6, 6), dtype)
    b = jnp.zeros((6,), dtype)
    err = jnp.zeros((), dtype)
    H, b, err = _offset_terms(
        H, b, err, pw[0], pw[1], pw[2], ok, cnt,
        mean[0], mean[1], mean[2], [cov[c] for c in range(6)], t6,
    )
    return VGICPResult(pose, done, iters, err, H)
