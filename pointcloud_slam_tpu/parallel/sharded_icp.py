"""Point-axis-sharded scan-to-map registration over a device mesh.

TPU-native replacement for the reference's per-point parallelism
(`std::execution::par_unseq` in laser_mapping.cc:606-698, OpenMP in
ndt_omp/fast_gicp): the point axis of a frame is sharded across devices
(`sp`), each device computes its shard's correspondences and its partial
(H, b, err) from the replicated voxel map, and a `psum` over ICI combines
them; the 6x6 solve is then computed identically on every device. A leading
batch axis of independent problems shards over `dp`.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.7 exposes shard_map at top level
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from .. import ops
from ..geom import se3
from ..register import icp as icp_mod
from ..register import solver as solver_mod


def sharded_point_to_plane_icp(
    mesh: Mesh,
    grid_cfg: ops.GridConfig,
    grid: ops.VoxelHashMap,
    source: jnp.ndarray,       # (B, 3, N) — B sharded over dp, N over sp
    source_mask: jnp.ndarray,  # (B, N)
    init_pose: se3.Pose,       # (B, 3, 3), (B, 3)
    cfg: icp_mod.ICPConfig = icp_mod.ICPConfig(),
):
    """Batch of B scan-to-map alignments against a shared (replicated) map."""

    def local_solve(grid_local, src, mask, R0, t0):
        # src: (B/dp, 3, N/sp) on this device; identical iteration structure
        # (cached-search GN) to the single-device solver, with psum over sp
        def one(src_i, mask_i, R0_i, t0_i):
            def search(pose):
                pw = pose.apply(src_i)
                return icp_mod.correspondences(cfg, grid_cfg, grid_local, pw, mask_i)

            pose, done, iters, _H, _coef, _valid = icp_mod.icp_loop(cfg, src_i, se3.Pose(R0_i, t0_i), search, psum_axis="sp")
            return pose.R, pose.t, done, iters

        return jax.vmap(one)(src, mask, R0, t0)

    fn = shard_map(
        local_solve,
        mesh=mesh,
        in_specs=(P(), P("dp", None, "sp"), P("dp", "sp"), P("dp", None, None), P("dp", None)),
        out_specs=(P("dp", None, None), P("dp", None), P("dp"), P("dp")),
    )
    R, t, conv, iters = fn(grid, source, source_mask, init_pose.R, init_pose.t)
    return se3.Pose(R, t), conv, iters
