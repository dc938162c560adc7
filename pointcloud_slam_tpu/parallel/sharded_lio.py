"""Point-axis sharded LIO iterated-ESKF update over a device mesh.

The SURVEY §2.5 "SP" analogue for the odometry front end: the downsampled
scan's point axis is split across devices. Each device runs the kNN search,
plane fit, and Jacobian-row construction (the per-point FLOPs of
laser_mapping.cc:592-701) ONLY on its chunk; the 12x12 HTH / 12 HTh
reductions are psum'd over ICI inside every ESKF iteration (the `reduce`
hook of eskf.update_iterated). The 23-dim small-state math and the voxel-hash
map stay replicated — per iteration that is a ~600 B all-reduce, ICI-free
lunch, while the gather/fit work scales 1/n_devices.

Numerically identical to the single-device update (same correspondences,
same reductions up to summation order); tests/test_parallel.py checks
agreement on a CPU mesh.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.7 exposes shard_map at top level
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from .. import ops
from ..models.lio import eskf
from ..models.lio import pipeline as lio_pipeline


def sharded_lio_update(mesh: Mesh, cfg, grid, x0, P0, pts_body, mask, axis: str = "sp"):
    """Iterated ESKF update with the scan's point axis sharded on `axis`.

    pts_body (3, N) / mask (N,) must have N divisible by mesh.shape[axis].
    Returns the same UpdateResult fields the in-pipeline update produces
    (minus the per-point cache, which stays device-local).
    """

    def run(grid, x0, P0, pts, m):
        body_norm = jnp.sqrt(jnp.sum(pts * pts, axis=0))
        tbl = ops.knn_table(cfg.grid, grid)
        obs = lio_pipeline._obs_model(cfg, grid, pts, body_norm, m, tbl=tbl)
        upd = eskf.update_iterated(
            x0, P0, obs, cfg.laser_point_cov, cfg.max_iterations, cfg.epsi,
            reduce=lambda t: jax.lax.psum(t, axis),
        )
        return upd.x, upd.P, upd.iterations, upd.converged

    fn = shard_map(
        run,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(None, axis), P(axis)),
        out_specs=(P(), P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(fn)(grid, x0, P0, pts_body, mask)
