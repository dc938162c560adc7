"""Point-axis sharded LOAM scan-to-map matching over a device mesh.

The SURVEY §2.5 "SP" analogue for the SLAM front end (the OpenMP
corner/surf loops of mapOptmization.cpp:1259,1353): the corner and surf
point axes are split across devices; each device runs the kNN search,
line/plane fits and Jacobian-row construction only on its chunk, and the
6x6 H / 6 b / match-count reductions are psum'd over ICI at every
linearization (scan_to_map's `reduce` hook). The pose iteration, local
voxel-hash maps and the degeneracy projector stay replicated — per
linearization that is a ~200 B all-reduce while the gather/fit FLOPs scale
1/n_devices.

Numerically identical to the single-device solve (same correspondences,
same reductions up to summation order); tests/test_parallel.py checks
agreement on a CPU mesh.
"""

from __future__ import annotations

import functools

import jax
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.7 exposes shard_map at top level
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from ..models.liosam import scan2map as s2m


@functools.lru_cache(maxsize=32)
def _jitted(mesh: Mesh, cfg: s2m.Scan2MapConfig, axis: str):
    """One jit instance per (mesh, cfg, axis): this is a PER-FRAME kernel, so
    rebuilding the shard_map closure per call would retrace/recompile every
    invocation. The cached jit retraces only on new input shapes."""

    def run(cmap, smap, cp, cm, sp_, sm, pose):
        return s2m.scan_to_map(
            cfg, cmap, smap, cp, cm, sp_, sm, pose,
            reduce=lambda t: jax.lax.psum(t, axis),
        )

    fn = shard_map(
        run,
        mesh=mesh,
        in_specs=(P(), P(), P(None, axis), P(axis), P(None, axis), P(axis), P()),
        out_specs=P(),
        check_vma=False,
    )
    return jax.jit(fn)


def sharded_scan_to_map(mesh: Mesh, cfg: s2m.Scan2MapConfig, corner_map, surf_map,
                        corner_pts, corner_mask, surf_pts, surf_mask,
                        init_pose, axis: str = "sp") -> s2m.Scan2MapResult:
    """LOAM scan-to-map with both feature point axes sharded on `axis`.

    corner_pts (3, Nc) / surf_pts (3, Ns): Nc and Ns must be divisible by
    mesh.shape[axis]. Returns the same Scan2MapResult the in-pipeline solve
    produces (num_corner/num_surf are global counts).
    """
    return _jitted(mesh, cfg, axis)(corner_map, surf_map, corner_pts, corner_mask,
                                    surf_pts, surf_mask, init_pose)
