"""LOAM scan-to-map matching: corner/edge lines + surface planes.

Behavioral parity target (math re-derived, batched):
  reference `src/jueying_slam/src/mapOptmization.cpp`
  - `cornerOptimization` (:1255-1347): 5-NN in the corner map, line fit via
    covariance eigendecomposition (valid if l_max > 3 l_mid), point-to-line
    residual/coefficients,
  - `surfOptimization` (:1349-1419): 5-NN plane fit (A n = -1), validity by
    residual threshold, point-to-plane residual,
  - `LMOptimization` (:1442-1558): 6-DoF Gauss-Newton with the eigenvalue
    degeneracy guard (eig < 100 -> project the update out of those
    directions, `isDegenerate`),
  - `scan2MapOptimization` (:1560-1590): iterate matching + GN.

TPU design: both feature families become plane-style residual rows
[pw x n, n] (for lines, n is the in-plane perpendicular direction to the
fitted line) — one (6, N) Jacobian block and a psum-free H = J J^T.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ... import ops
from ...geom import fit, se3
from ...register import solver


def baked_grid(g: ops.GridConfig) -> ops.GridConfig:
    """Stencil-baked variant of a local-map grid config: same stencil and
    resolution, per-voxel capacity expanded to nearby x pts_per_voxel so the
    baked candidate budget matches the unbaked one. One-gather kNN inside
    scan_to_map measured the slam step at 19.6 vs 27.9 ms/keyframe on v5e
    (tools/profile_slam.py); the fit consumes the search through the baked
    fusion barrier in _corner_rows/_surf_rows."""
    return dataclasses.replace(g, pts_per_voxel=g.nearby * g.pts_per_voxel, baked=True)


@dataclasses.dataclass(frozen=True)
class Scan2MapConfig:
    corner_grid: ops.GridConfig = dataclasses.field(
        default_factory=lambda: ops.GridConfig(capacity=1 << 15, pts_per_voxel=8, resolution=0.4, nearby=7)
    )
    surf_grid: ops.GridConfig = dataclasses.field(
        default_factory=lambda: ops.GridConfig(capacity=1 << 16, pts_per_voxel=8, resolution=0.8, nearby=7)
    )
    max_corr_dist: float = 1.0       # 5-NN gate (kd-tree radius 1 m in ref)
    plane_threshold: float = 0.2
    line_ratio: float = 3.0
    degeneracy_eig: float = 100.0    # LMOptimization eigen threshold
    search_every: int = 3
    # one-iteration rounds before the regular cadence (fresh correspondences
    # while the init guess is still far; the static analogue of the
    # reference's per-iteration re-matching, scan2MapOptimization :1560-1590)
    warmup_searches: int = 3
    # 6 GN iterations, not the reference's fixed-loop 30: the reference
    # breaks on convergence (scan2MapOptimization :1560-1590 deltaR/deltaT
    # check) so it rarely pays for >6-10; our static schedule was paying for
    # frozen iterations. Measured on v5e inside the full slam_step
    # (tools/probe_slam_parts.py): 30 iters 19.5 ms -> 10 iters 11.5 ->
    # 6 iters 8.8 ms/frame with IDENTICAL final error (0.004 m) at every
    # point; 5/4 iters measure the same but leave no convergence margin, and
    # cutting searches (sched_* variants) costs accuracy (0.009+). Callers
    # needing a long schedule (e.g. cold-start localization) override
    # max_iterations explicitly.
    solver: solver.SolverConfig = dataclasses.field(
        default_factory=lambda: solver.SolverConfig(max_iterations=6, degeneracy_threshold=100.0)
    )


class Scan2MapResult(NamedTuple):
    pose: se3.Pose
    converged: jnp.ndarray
    iterations: jnp.ndarray
    num_corner: jnp.ndarray
    num_surf: jnp.ndarray
    H: jnp.ndarray
    degenerate: jnp.ndarray


def _corner_rows(cfg, grid, pw, mask):
    """Point-to-line correspondences -> plane-style rows (n, r)."""
    nbrs, d2, cnt, _ = ops.knn(cfg.corner_grid, grid, pw, k=5, max_range=cfg.max_corr_dist)
    if cfg.corner_grid.baked:
        # same libtpu fusion-miscompile guard as register/icp.correspondences:
        # materialize the baked-grid search before the fit consumes it
        nbrs, d2, cnt = jax.lax.optimization_barrier((nbrs, d2, cnt))
    nmask = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 0) < cnt[None, :]
    center, direction, line_ok = fit.line_fit(nbrs, nmask, cfg.line_ratio)
    ok = mask & line_ok & (cnt >= 5)
    # perpendicular from the line to the point: u = (p - c) - ((p - c).d) d
    ex = pw[0] - center[0]
    ey = pw[1] - center[1]
    ez = pw[2] - center[2]
    dot = ex * direction[0] + ey * direction[1] + ez * direction[2]
    ux = ex - dot * direction[0]
    uy = ey - dot * direction[1]
    uz = ez - dot * direction[2]
    rr = jnp.sqrt(jnp.maximum(ux * ux + uy * uy + uz * uz, 1e-12))
    nx = jnp.where(ok, ux / rr, 0.0)
    ny = jnp.where(ok, uy / rr, 0.0)
    nz = jnp.where(ok, uz / rr, 0.0)
    r = jnp.where(ok, rr, 0.0)
    # plane-style offset so the residual recomputes at fresh poses:
    # r_new = n . pw_new + d with d = r_search - n . pw_search
    d_off = r - (pw[0] * nx + pw[1] * ny + pw[2] * nz)
    # robust LOAM weighting s = 1 - 0.9 |r| (mapOptmization.cpp:1330)
    s = jnp.where(ok, jnp.clip(1.0 - 0.9 * jnp.abs(r), 0.0, 1.0), 0.0)
    return nx, ny, nz, d_off, s, ok


def _surf_rows(cfg, grid, pw, mask):
    nbrs, d2, cnt, _ = ops.knn(cfg.surf_grid, grid, pw, k=5, max_range=cfg.max_corr_dist)
    if cfg.surf_grid.baked:
        nbrs, d2, cnt = jax.lax.optimization_barrier((nbrs, d2, cnt))
    nmask = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 0) < cnt[None, :]
    coef, plane_ok = fit.plane_fit(nbrs, nmask, cfg.plane_threshold, 5)
    ok = mask & plane_ok & (cnt >= 5)
    nx = jnp.where(ok, coef[0], 0.0)
    ny = jnp.where(ok, coef[1], 0.0)
    nz = jnp.where(ok, coef[2], 0.0)
    d_off = jnp.where(ok, coef[3], 0.0)
    r = jnp.where(ok, pw[0] * nx + pw[1] * ny + pw[2] * nz + d_off, 0.0)
    # robust weight s = 1 - 0.9 |r| / sqrt(|p|) (mapOptmization.cpp:1392)
    pn = jnp.sqrt(jnp.sqrt(pw[0] ** 2 + pw[1] ** 2 + pw[2] ** 2) + 1e-9)
    s = jnp.where(ok, jnp.clip(1.0 - 0.9 * jnp.abs(r) / pn, 0.0, 1.0), 0.0)
    return nx, ny, nz, d_off, s, ok


def _hb(pw, rows):
    nx, ny, nz, d_off, s, ok = rows
    r = s * (pw[0] * nx + pw[1] * ny + pw[2] * nz + d_off)
    nx, ny, nz = nx * s, ny * s, nz * s
    cx = pw[1] * nz - pw[2] * ny
    cy = pw[2] * nx - pw[0] * nz
    cz = pw[0] * ny - pw[1] * nx
    J = jnp.stack([cx, cy, cz, nx, ny, nz], axis=0)
    H = J @ J.T
    b = J @ r
    return H, b, jnp.sum(r * r), jnp.sum(ok)


@functools.partial(jax.jit, static_argnames=("cfg", "reduce"))
def scan_to_map(
    cfg: Scan2MapConfig,
    corner_map: ops.VoxelHashMap,
    surf_map: ops.VoxelHashMap,
    corner_pts: jnp.ndarray,   # (3, Nc) sensor frame
    corner_mask: jnp.ndarray,
    surf_pts: jnp.ndarray,     # (3, Ns)
    surf_mask: jnp.ndarray,
    init_pose: Optional[se3.Pose] = None,
    reduce=None,               # cross-device sum hook for (H, b, nc, ns) —
    # the point-axis sharded path (parallel/sharded_scan2map.py) psums the
    # 6x6/6 reductions over ICI per linearization, like eskf's reduce hook.
    # NB `reduce` is a STATIC argname: pass a stable (module-level or cached)
    # callable — a fresh lambda per call would retrace and recompile every
    # time. parallel.sharded_scan_to_map is the sanctioned entry point; it
    # lru-caches the jitted wrapper per (mesh, cfg, axis).
) -> Scan2MapResult:
    if init_pose is None:
        init_pose = se3.identity(surf_pts.dtype)
    scfg = cfg.solver
    dtype = surf_pts.dtype
    Nc, Ns = corner_pts.shape[1], surf_pts.shape[1]

    def search(pose):
        pc = pose.apply(corner_pts)
        ps = pose.apply(surf_pts)
        return _corner_rows(cfg, corner_map, pc, corner_mask), _surf_rows(cfg, surf_map, ps, surf_mask)

    def _linearize(pose, cache):
        crows, srows = cache
        pc = pose.apply(corner_pts)
        ps = pose.apply(surf_pts)
        Hc, bc, ec, nc = _hb(pc, crows)
        Hs, bs, es, ns = _hb(ps, srows)
        H, b, nc, ns = Hc + Hs, bc + bs, nc, ns
        if reduce is not None:
            H, b, nc, ns = reduce((H, b, nc, ns))
        return H, b, nc, ns

    # static search schedule: one corner+surf correspondence pass per
    # `search_every`-iteration round, unrolled outside the scan (no
    # data-dependent lax.cond around the search — see register.icp.icp_loop)
    def body(carry, it):
        pose, done, iters, cache, proj = carry
        H, b, _, _ = _linearize(pose, cache)
        d = solver._solve_step(H, b, jnp.zeros((), dtype), proj)
        conv = solver._converged(d, scfg)
        pose_new = se3.retract_left(pose, d)
        pose = jax.tree.map(lambda a, bb: jnp.where(done, a, bb), pose, pose_new)
        iters = iters + jnp.where(done, 0, 1)
        done = done | conv
        return (pose, done, iters, cache, proj), None

    # Degeneracy projector cadence: recomputed ONCE PER SEARCH ROUND, from
    # the fresh correspondences, and reused across the round's iterations.
    # Measured on v5e vs alternatives: per-iteration eigh costs ~0.15 ms x 30
    # iterations; a single iterCount==0 projector (the reference's literal
    # cadence, mapOptmization.cpp:1508-1536) needs a standalone search phase
    # (~5 ms) AND loses accuracy (the iter-0 H — large residuals, small
    # robust weights — projects out directions later rounds recover). The
    # per-round form re-evaluates at every warmup round and at each regular
    # round, where the correspondences (and hence H's conditioning) actually
    # change.
    def round_body(chunk):
        def rb(carry, _):
            pose, done, iters, cache, proj = carry
            cache = search(pose)
            H0, _, _, _ = _linearize(pose, cache)
            proj = solver.degeneracy_projection(H0, cfg.degeneracy_eig)
            done = done | (iters >= scfg.max_iterations)
            carry, _ = jax.lax.scan(
                body, (pose, done, iters, cache, proj), jnp.arange(chunk, dtype=jnp.int32)
            )
            return carry, None
        return rb

    zero_s = jnp.sum(init_pose.t) * 0
    zc = jnp.sum(corner_pts) * 0
    zs = jnp.sum(surf_pts) * 0
    cache0 = (
        tuple([jnp.zeros((Nc,), dtype) + zc] * 5 + [jnp.zeros((Nc,), bool) | (zc > 1)]),
        tuple([jnp.zeros((Ns,), dtype) + zs] * 5 + [jnp.zeros((Ns,), bool) | (zs > 1)]),
    )
    proj0 = (zero_s > 1.0, jnp.eye(6, dtype=dtype) + zero_s)
    carry = (init_pose, zero_s > 1.0, zero_s.astype(jnp.int32), cache0, proj0)
    warmup = min(cfg.warmup_searches, scfg.max_iterations)
    if warmup > 0:
        carry, _ = jax.lax.scan(round_body(1), carry, None, length=warmup)
    n_rounds = -(-(scfg.max_iterations - warmup) // cfg.search_every)
    if n_rounds > 0:
        carry, _ = jax.lax.scan(round_body(cfg.search_every), carry, None, length=n_rounds)
    (pose, done, iters, cache, proj) = carry

    H, b, nc, ns = _linearize(pose, cache)
    eigs = jnp.linalg.eigvalsh(H)
    return Scan2MapResult(pose, done, iters, nc, ns, H, eigs[0] < cfg.degeneracy_eig)
