#!/usr/bin/env python
"""Headline benchmark: scan-to-map point-to-plane ICP frames/sec on one chip.

BASELINE.json metric: "Scan-match frames/sec/chip (20k-pt Livox)". Config 1:
pairwise point-to-plane ICP, 20k-pt frames, 30 GN iterations. Baseline target:
100 Hz per v5e chip (vs_baseline = achieved / 100).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from pointcloud_slam_tpu import ops, register  # noqa: E402
from pointcloud_slam_tpu.io import synthetic  # noqa: E402

N_POINTS = 20_000
N_ITERS = 30
GRID = ops.GridConfig(capacity=1 << 17, pts_per_voxel=4, resolution=0.5, probe=4, nearby=7)
ICP = register.ICPConfig(
    search_every=10,
    solver=register.SolverConfig(max_iterations=N_ITERS, rotation_epsilon=0.0, translation_epsilon=0.0),
)  # epsilon 0: run all 30 iterations — honest full-workload timing


def main():
    world = synthetic.make_room_cloud(60_000, seed=0)
    R, t = synthetic.random_pose(seed=1, rot_scale=0.05, trans_scale=0.3)
    src = ((world[:N_POINTS] - t) @ R).astype(np.float32)

    grid_cfg, grid = register.build_target_map(jnp.asarray(world.T), grid_cfg=GRID)
    src_j = jnp.asarray(np.ascontiguousarray(src.T))

    solve = jax.jit(lambda g, s: register.point_to_plane_icp(grid_cfg, g, s, cfg=ICP))
    res = solve(grid, src_j)
    # sanity via an explicit download (this also forces real execution — the
    # axon tunnel defers compute until a device->host read; honest timing
    # must read back every repetition)
    terr = float(np.linalg.norm(np.asarray(res.pose.t) - t))

    reps = 20
    t0 = time.perf_counter()
    for _ in range(reps):
        res = solve(grid, src_j)
        _ = np.asarray(res.pose.t)
    dt = (time.perf_counter() - t0) / reps
    fps = 1.0 / dt

    out = {
        "metric": "scan_to_map_icp_fps_20k_30iter",
        "value": round(fps, 2),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / 100.0, 3),
        "detail": {"per_frame_ms": round(dt * 1e3, 3), "trans_err_m": round(terr, 5), "device": str(jax.devices()[0])},
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
