"""Point-to-plane ICP against a voxel-hash map — the flagship registration path.

Behavioral parity target (re-designed as dense batched ops):
  reference `src/jueying_lio/src/laser_mapping.cc:592-701` (ObsModel: 5-NN in
  iVox -> esti_plane -> point-to-plane residual + Jacobian rows) driving the
  same correspondence math as a standalone scan-to-map ICP, and
  `fast_gicp/.../lsq_registration_impl.hpp` for the solver loop.

TPU design: each GN iteration is (stencil kNN gather) -> (batched plane fit)
-> (residual/Jacobian as one (N, 6) block) -> (H = J^T J on the MXU) ->
(6x6 solve). No host round-trips; the whole solve jits as one XLA program.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .. import ops
from ..geom import fit, se3
from . import solver


@dataclasses.dataclass(frozen=True)
class ICPConfig:
    num_neighbors: int = 5
    min_neighbors: int = 3          # options::MIN_NUM_MATCH_POINTS
    max_corr_dist: float = 5.0      # kNN range gate
    plane_threshold: float = 0.1    # options::ESTI_PLANE_THRESHOLD
    # re-run the kNN + plane-fit search every this many GN iterations and
    # reuse the cached planes in between (the reference equally skips the NN
    # search between IEKF iterations until re-convergence, laser_mapping.cc:618;
    # residuals against cached planes are re-evaluated at the fresh pose).
    # The schedule is static (unrolled rounds) — see icp_loop.
    search_every: int = 5
    # the first `warmup_searches` rounds are one iteration long (search every
    # iteration while the pose is still moving fast from a coarse init) — the
    # static replacement for the old adaptive big-step refresh
    warmup_searches: int = 2
    # retained for config compatibility; the adaptive mid-scan refresh was
    # removed with the static search schedule (see icp_loop docstring)
    refresh_trans: float = 0.05
    refresh_rot: float = 0.02
    solver: solver.SolverConfig = dataclasses.field(default_factory=lambda: solver.SolverConfig())


class ICPResult(NamedTuple):
    pose: se3.Pose
    converged: jnp.ndarray
    iterations: jnp.ndarray
    final_error: jnp.ndarray
    num_inliers: jnp.ndarray
    H: jnp.ndarray  # (6, 6) information matrix export (degeneracy judge)


def correspondences(
    cfg: ICPConfig,
    grid_cfg: ops.GridConfig,
    grid: ops.VoxelHashMap,
    pts_world: jnp.ndarray,
    mask: jnp.ndarray,
    barrier: bool = True,
):
    """5-NN + plane fit for each world-frame point. pts_world is (3, N).

    Returns (coef (4, N) plane [n, d], valid (N,)).
    """
    nbrs, d2, cnt, _ = ops.knn(grid_cfg, grid, pts_world, k=cfg.num_neighbors, max_range=cfg.max_corr_dist)
    if grid_cfg.baked and barrier:
        # fusing the baked-grid kNN gather chain into the plane-fit compute
        # miscompiles on this libtpu in SINGLE-FRAME programs (flaky worker
        # crash, or deterministically wrong neighbors — tools/repro_baked_single);
        # a barrier forces the search to materialize before the fit consumes
        # it. The batched multi-frame formulation of the identical workload
        # never misbehaves (full repro matrix), so batched callers pass
        # barrier=False and keep the fully fused schedule.
        nbrs, d2, cnt = jax.lax.optimization_barrier((nbrs, d2, cnt))
    nmask = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 0) < cnt[None, :]
    coef, plane_ok = fit.plane_fit(nbrs, nmask, threshold=cfg.plane_threshold, min_pts=cfg.min_neighbors)
    valid = mask & plane_ok & (cnt >= cfg.min_neighbors)
    return coef, valid


def _linearize_cached(coef, valid, pw, dtype):
    """Residual/Jacobian against cached plane coefficients at the pose `pw`."""
    # select-with-where (not multiply): invalid fits may hold non-finite values
    nx = jnp.where(valid, coef[0], 0.0)
    ny = jnp.where(valid, coef[1], 0.0)
    nz = jnp.where(valid, coef[2], 0.0)
    r_w = jnp.where(valid, pw[0] * nx + pw[1] * ny + pw[2] * nz + coef[3], 0.0)
    # left-multiplicative tangent: dr/d[omega, v] = [(pw x n), n]
    cx = pw[1] * nz - pw[2] * ny
    cy = pw[2] * nx - pw[0] * nz
    cz = pw[0] * ny - pw[1] * nx
    J = jnp.stack([cx, cy, cz, nx, ny, nz], axis=0)  # (6, N)
    H = J @ J.T
    b = J @ r_w
    err = jnp.sum(r_w * r_w)
    return H, b, err


def _linearize(cfg, grid_cfg, grid, src, mask, pose):
    """src (3, N) in sensor frame. Returns (H (6,6), b (6,), err, n_inliers)."""
    pw = pose.apply(src)
    coef, valid = correspondences(cfg, grid_cfg, grid, pw, mask)
    H, b, err = _linearize_cached(coef, valid, pw, src.dtype)
    return H, b, err, jnp.sum(valid)



def _round_counts(cfg: ICPConfig, total: int):
    """Static search schedule: `warmup_searches` one-iteration rounds first
    (fresh correspondences while a coarse init is still moving fast), then
    ceil of the rest in `search_every`-iteration rounds. Each phase is ONE
    lax.scan over rounds with the search unconditional at the round head, so
    the search appears once per phase in the compiled graph (an unrolled
    per-round formulation multiplied compile time by the round count, and a
    lax.cond-in-scan formulation crashes the TPU worker on baked grids).
    Iterations beyond solver.max_iterations are frozen via the `done` gate."""
    warmup = min(cfg.warmup_searches, total)
    rest = total - warmup
    n_rounds = -(-rest // cfg.search_every) if rest > 0 else 0
    return warmup, n_rounds


def icp_loop(cfg: ICPConfig, source: jnp.ndarray, init_pose: se3.Pose, search, psum_axis: Optional[str] = None):
    """The cached-search GN iteration shared by the single-device and
    point-axis-sharded solvers. `search(pose) -> (coef (4, N), valid (N,))`
    produces plane correspondences for this device's point shard; when
    `psum_axis` is set, (H, b, err) are combined across that mesh axis so all
    devices apply the identical 6-DoF update.

    Search schedule is STATIC: one search per `search_every`-iteration round,
    unrolled outside the scan. (The earlier data-dependent formulation —
    search inside a lax.cond inside the scan body — reliably crashes the TPU
    worker on baked-grid programs; the static schedule is also the cadence
    the reference effectively runs, laser_mapping.cc:618.)"""
    scfg = cfg.solver
    dtype = source.dtype

    def body(carry, it):
        pose, done, iters, coef, valid, H_last = carry
        pw = pose.apply(source)
        H, b, err = _linearize_cached(coef, valid, pw, dtype)
        if psum_axis is not None:
            H = jax.lax.psum(H, psum_axis)
            b = jax.lax.psum(b, psum_axis)
            err = jax.lax.psum(err, psum_axis)
        d = solver._solve_step(H, b, jnp.zeros((), dtype), solver.inline_projection(H, scfg.degeneracy_threshold))
        conv = solver._converged(d, scfg)
        pose_new = se3.retract_left(pose, d)
        pose = jax.tree.map(lambda a, bb: jnp.where(done, a, bb), pose, pose_new)
        iters = iters + jnp.where(done, 0, 1)
        done = done | conv
        return (pose, done, iters, coef, valid, H), None

    def round_body(chunk):
        def rb(carry, _):
            pose, done, iters, coef, valid, H = carry
            coef, valid = search(pose)
            done = done | (iters >= scfg.max_iterations)
            carry, _ = jax.lax.scan(
                body, (pose, done, iters, coef, valid, H), jnp.arange(chunk, dtype=jnp.int32)
            )
            return carry, None
        return rb

    zero_s = jnp.sum(init_pose.t) * 0
    pose = init_pose
    done = zero_s > 1.0
    iters = zero_s.astype(jnp.int32)
    H = jnp.zeros((6, 6), dtype) + zero_s
    N = source.shape[1]
    zero_n = jnp.sum(source) * 0
    coef = jnp.zeros((4, N), dtype) + zero_n
    valid = (zero_n > 1.0) & jnp.zeros((N,), bool)
    carry = (pose, done, iters, coef, valid, H)
    warmup, n_rounds = _round_counts(cfg, scfg.max_iterations)
    if warmup > 0:
        carry, _ = jax.lax.scan(round_body(1), carry, None, length=warmup)
    if n_rounds > 0:
        carry, _ = jax.lax.scan(round_body(cfg.search_every), carry, None, length=n_rounds)
    pose, done, iters, coef, valid, H = carry
    return pose, done, iters, H, coef, valid


@functools.partial(jax.jit, static_argnames=("grid_cfg", "cfg"))
def point_to_plane_icp(
    grid_cfg: ops.GridConfig,
    grid: ops.VoxelHashMap,
    source: jnp.ndarray,
    source_mask: Optional[jnp.ndarray] = None,
    init_pose: Optional[se3.Pose] = None,
    cfg: ICPConfig = ICPConfig(),
) -> ICPResult:
    """Align `source` (3, N) to the map. Returns the world<-source pose."""
    if source_mask is None:
        source_mask = jnp.ones(source.shape[1], bool)
    if init_pose is None:
        init_pose = se3.identity(source.dtype)

    if grid_cfg.baked:
        # On baked grids the single-frame program shape MISCOMPILES on this
        # libtpu (wrong neighbors, 0.5-1 m pose errors; the round-2
        # optimization_barrier mitigation is NOT sufficient — hardware-verified
        # r3s5). The batched formulation of the identical workload is correct
        # AND faster (serial chain 10.9 ms vs 17.3 ms/frame), so the baked
        # single-frame path is the batched kernel at B=1.
        pose_b, done_b, iters_b, (err_b, inl_b, H_b) = batched_point_to_plane_icp(
            grid_cfg, grid, source[None], source_mask[None],
            init_R=init_pose.R[None], init_t=init_pose.t[None],
            cfg=cfg, return_stats=True,
        )
        return ICPResult(se3.Pose(pose_b.R[0], pose_b.t[0]), done_b[0], iters_b[0],
                         err_b[0], inl_b[0], H_b[0])

    def search(pose):
        pw = pose.apply(source)
        return correspondences(cfg, grid_cfg, grid, pw, source_mask)

    pose, done, iters, H, coef, valid = icp_loop(cfg, source, init_pose, search)
    # final stats from the last cached correspondences re-evaluated at the
    # converged pose (the reference equally reports the last iteration's
    # effective counts/residuals rather than re-searching)
    _, _, err = _linearize_cached(coef, valid, pose.apply(source), source.dtype)
    return ICPResult(pose, done, iters, err, jnp.sum(valid), H)


@functools.partial(jax.jit, static_argnames=("grid_cfg", "cfg", "return_stats"))
def batched_point_to_plane_icp(
    grid_cfg: ops.GridConfig,
    grid: ops.VoxelHashMap,
    sources: jnp.ndarray,      # (B, 3, N) — B independent frames, one shared map
    source_mask: Optional[jnp.ndarray] = None,  # (B, N)
    init_R: Optional[jnp.ndarray] = None,       # (B, 3, 3)
    init_t: Optional[jnp.ndarray] = None,       # (B, 3)
    cfg: ICPConfig = ICPConfig(),
    return_stats: bool = False,
):
    """Throughput-mode ICP: B frames solved in ONE program.

    The point axes of all problems are flattened into a single (3, B*N) query
    set so every kNN search runs as one gather pass; H/b reduce per problem
    via a (6, B, N) einsum. The search schedule is shared across the batch
    (a vmapped lax.cond would execute both branches and destroy the
    correspondence-caching win). This is the production serving shape: it
    amortizes per-program launch overhead across frames.
    """
    B, _, N = sources.shape
    dtype = sources.dtype
    if source_mask is None:
        source_mask = jnp.ones((B, N), bool)
    if init_R is None:
        init_R = jnp.broadcast_to(jnp.eye(3, dtype=dtype), (B, 3, 3))
    if init_t is None:
        init_t = jnp.zeros((B, 3), dtype)
    scfg = cfg.solver
    mask_flat = source_mask.reshape(B * N)

    def transform(R, t):
        pw = jnp.einsum("bij,bjn->bin", R, sources) + t[:, :, None]
        return pw.transpose(1, 0, 2).reshape(3, B * N)

    def search(R, t):
        # barrier=False: the batched formulation is not affected by the
        # baked-grid fusion miscompile (see correspondences)
        return correspondences(cfg, grid_cfg, grid, transform(R, t), mask_flat, barrier=False)

    # Statically unrolled search schedule: one search per round, then
    # `search_every` GN iterations against the cached planes inside a scan.
    # No data-dependent lax.cond around the search — the conditional-search-
    # inside-scan formulation hits a TPU runtime fault (worker crash) on
    # large batched programs, and the static schedule is also what the
    # benchmark semantics promise (fixed search cadence, full workload).
    def body(carry, it):
        R, t, done, iters, coef, valid = carry
        pw = transform(R, t)
        nx = jnp.where(valid, coef[0], 0.0)
        ny = jnp.where(valid, coef[1], 0.0)
        nz = jnp.where(valid, coef[2], 0.0)
        r_w = jnp.where(valid, pw[0] * nx + pw[1] * ny + pw[2] * nz + coef[3], 0.0)
        cx = pw[1] * nz - pw[2] * ny
        cy = pw[2] * nx - pw[0] * nz
        cz = pw[0] * ny - pw[1] * nx
        J = jnp.stack([cx, cy, cz, nx, ny, nz], axis=0).reshape(6, B, N)
        rb = r_w.reshape(B, N)
        H = jnp.einsum("ibn,jbn->bij", J, J)
        b = jnp.einsum("ibn,bn->bi", J, rb)
        d = jax.vmap(lambda Hb, bb: solver._solve_step(Hb, bb, jnp.zeros((), dtype), solver.inline_projection(Hb, scfg.degeneracy_threshold)))(H, b)
        conv = (jnp.max(jnp.abs(d[:, :3]), axis=1) < scfg.rotation_epsilon) & (
            jnp.max(jnp.abs(d[:, 3:]), axis=1) < scfg.translation_epsilon
        )
        dR = so3_exp_batched(d[:, :3])
        R_new = dR @ R
        t_new = jnp.einsum("bij,bj->bi", dR, t) + d[:, 3:]
        keep = done[:, None, None]
        R = jnp.where(keep, R, R_new)
        t = jnp.where(done[:, None], t, t_new)
        iters = iters + jnp.where(done, 0, 1)
        done = done | conv
        return (R, t, done, iters, coef, valid), None

    zero_s = jnp.sum(init_t) * 0
    R, t = init_R, init_t
    done = jnp.zeros((B,), bool) | (zero_s > 1.0)
    iters = jnp.zeros((B,), jnp.int32) + zero_s.astype(jnp.int32)
    def round_body(chunk):
        def rb(carry, _):
            R, t, done, iters, coef, valid = carry
            coef, valid = search(R, t)
            done = done | (iters >= scfg.max_iterations)
            carry, _ = jax.lax.scan(
                body, (R, t, done, iters, coef, valid), jnp.arange(chunk, dtype=jnp.int32)
            )
            return carry, None
        return rb

    zero_n = jnp.sum(sources) * 0
    coef = jnp.zeros((4, B * N), dtype) + zero_n
    valid = (zero_n > 1.0) & jnp.zeros((B * N,), bool)
    carry = (R, t, done, iters, coef, valid)
    warmup, n_rounds = _round_counts(cfg, scfg.max_iterations)
    if warmup > 0:
        carry, _ = jax.lax.scan(round_body(1), carry, None, length=warmup)
    if n_rounds > 0:
        carry, _ = jax.lax.scan(round_body(cfg.search_every), carry, None, length=n_rounds)
    R, t, done, iters, coef, valid = carry
    if not return_stats:
        return se3.Pose(R, t), done, iters
    # final per-frame stats from the last cached correspondences re-evaluated
    # at the converged pose (the ICPResult contract of the single-frame path)
    pw = transform(R, t)
    nx = jnp.where(valid, coef[0], 0.0)
    ny = jnp.where(valid, coef[1], 0.0)
    nz = jnp.where(valid, coef[2], 0.0)
    r_w = jnp.where(valid, pw[0] * nx + pw[1] * ny + pw[2] * nz + coef[3], 0.0)
    cx = pw[1] * nz - pw[2] * ny
    cy = pw[2] * nx - pw[0] * nz
    cz = pw[0] * ny - pw[1] * nx
    J = jnp.stack([cx, cy, cz, nx, ny, nz], axis=0).reshape(6, B, N)
    H = jnp.einsum("ibn,jbn->bij", J, J)
    err = jnp.sum(r_w.reshape(B, N) ** 2, axis=1)
    inliers = jnp.sum(valid.reshape(B, N), axis=1)
    return se3.Pose(R, t), done, iters, (err, inliers, H)


def so3_exp_batched(w: jnp.ndarray) -> jnp.ndarray:
    """(B, 3) -> (B, 3, 3); thin alias over geom.so3.exp (already batched)."""
    from ..geom import so3 as _so3

    return _so3.exp(w)


def build_target_map(
    target: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    grid_cfg: Optional[ops.GridConfig] = None,
) -> tuple:
    """Convenience: drop a target cloud (3, N) into a fresh voxel map."""
    if grid_cfg is None:
        grid_cfg = ops.GridConfig()
    if mask is None:
        mask = jnp.ones(target.shape[1], bool)
    grid = ops.create(grid_cfg, dtype=target.dtype)
    grid = ops.insert(grid_cfg, grid, target, mask)
    return grid_cfg, grid


@functools.partial(jax.jit, static_argnames=("grid_cfg",))
def fitness_score(
    grid_cfg: ops.GridConfig,
    grid: ops.VoxelHashMap,
    source_world: jnp.ndarray,
    mask: jnp.ndarray,
    max_range: float = 1.0,
):
    """Mean squared NN distance of matched points (pcl::Registration::getFitnessScore
    semantics, used by the reference's loop-closure and localization gates,
    e.g. mapOptmization.cpp:693, localization.cpp:342-375)."""
    _, d2, cnt, _idx = ops.knn(grid_cfg, grid, source_world, k=1, max_range=max_range)
    matched = (cnt > 0) & mask
    d = jnp.where(matched, d2[0, :], 0.0)
    n = jnp.maximum(jnp.sum(matched), 1)
    return jnp.sum(d) / n, jnp.sum(matched)
