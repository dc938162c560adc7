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
):
    """5-NN + plane fit for each world-frame point.

    Returns (coef (N, 4) plane [n, d], valid (N,)).
    """
    nbrs, d2, cnt = ops.knn(grid_cfg, grid, pts_world, k=cfg.num_neighbors, max_range=cfg.max_corr_dist)
    nmask = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1) < cnt[:, None]
    coef, plane_ok = fit.plane_fit(nbrs, nmask, threshold=cfg.plane_threshold, min_pts=cfg.min_neighbors)
    valid = mask & plane_ok & (cnt >= cfg.min_neighbors)
    return coef, valid


def _linearize(cfg, grid_cfg, grid, src, mask, pose):
    pw = pose.apply(src)
    coef, valid = correspondences(cfg, grid_cfg, grid, pw, mask)
    # select-with-where (not multiply): invalid fits may hold non-finite values
    n = jnp.where(valid[:, None], coef[:, :3], 0.0)
    r_w = jnp.where(valid, jnp.sum(n * pw, axis=-1) + coef[:, 3], 0.0)
    # left-multiplicative tangent: dr/d[omega, v] = [(pw x n), n]
    J = jnp.concatenate([jnp.cross(pw, n), n], axis=-1)
    H = J.T @ J
    b = J.T @ r_w
    err = jnp.sum(r_w * r_w)
    return H, b, err, jnp.sum(valid)


@functools.partial(jax.jit, static_argnames=("grid_cfg", "cfg"))
def point_to_plane_icp(
    grid_cfg: ops.GridConfig,
    grid: ops.VoxelHashMap,
    source: jnp.ndarray,
    source_mask: Optional[jnp.ndarray] = None,
    init_pose: Optional[se3.Pose] = None,
    cfg: ICPConfig = ICPConfig(),
) -> ICPResult:
    """Align `source` (N, 3) to the map. Returns the world<-source pose."""
    if source_mask is None:
        source_mask = jnp.ones(source.shape[0], bool)
    if init_pose is None:
        init_pose = se3.identity(source.dtype)

    num_inliers = jnp.zeros((), jnp.int32)

    def linearize(pose):
        H, b, err, _ = _linearize(cfg, grid_cfg, grid, source, source_mask, pose)
        return H, b, err

    res = solver.gauss_newton(linearize, init_pose, cfg.solver)
    _, _, err, ninl = _linearize(cfg, grid_cfg, grid, source, source_mask, res.pose)
    return ICPResult(res.pose, res.converged, res.iterations, err, ninl, res.H)


def build_target_map(
    target: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    grid_cfg: Optional[ops.GridConfig] = None,
) -> tuple:
    """Convenience: drop a target cloud into a fresh voxel map for pairwise ICP."""
    if grid_cfg is None:
        grid_cfg = ops.GridConfig()
    if mask is None:
        mask = jnp.ones(target.shape[0], bool)
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
    _, d2, cnt = ops.knn(grid_cfg, grid, source_world, k=1, max_range=max_range)
    matched = (cnt > 0) & mask
    d = jnp.where(matched, d2[:, 0], 0.0)
    n = jnp.maximum(jnp.sum(matched), 1)
    return jnp.sum(d) / n, jnp.sum(matched)
