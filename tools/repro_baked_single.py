#!/usr/bin/env python
"""Minimal repro / bisect driver for the baked-grid single-frame TPU fault.

Round-2 observation (`ops/voxel_grid.py` KNOWN LIMITATION): a SINGLE-frame
`point_to_plane_icp` over a `baked=True` grid at N~20k crashes the TPU
worker, while the batched formulation of the identical workload runs fine.

This script isolates the trigger. Each case runs in a SUBPROCESS (a worker
crash must not kill the bisect loop):

  python tools/repro_baked_single.py --case knn --n 20480      # plain query
  python tools/repro_baked_single.py --case icp --n 20480      # full solve
  python tools/repro_baked_single.py --case batched1 --n 20480 # B=1 batched
  python tools/repro_baked_single.py --bisect                  # full matrix

Outcomes per case: OK (ran, finite outputs), CRASH (process died), or an
exception string. Results land in stdout; --bisect prints a table.
"""

import argparse
import os
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def run_case(case, n, iters, baked, capacity, pts=0, nearby=0):
    import numpy as np
    import jax
    import jax.numpy as jnp
    from pointcloud_slam_tpu import ops, register
    from pointcloud_slam_tpu.io import synthetic

    grid_cfg = ops.GridConfig(
        capacity=capacity,
        pts_per_voxel=pts or (48 if baked else 8),
        resolution=0.5,
        nearby=nearby or (1 if baked else 7),
        baked=baked,
    )
    world = synthetic.make_room_cloud(60_000, seed=0)
    _, grid = register.build_target_map(jnp.asarray(world.T), grid_cfg=grid_cfg)

    rng = np.random.default_rng(1)
    src = jnp.asarray(rng.choice(world, size=n).T, jnp.float32)
    mask = jnp.ones(n, bool)

    if case == "knn":
        nbrs, d2, cnt, _ = jax.jit(
            lambda s: ops.knn(grid_cfg, grid, s, k=5, max_range=1.0)
        )(src)
        jax.block_until_ready(d2)
        print("OK", float(jnp.sum(cnt)))
    elif case == "corr":
        # knn + plane fit fused in one program — the r3-refined minimal crash
        # shape: at N~20k over a baked grid this CRASHES the TPU worker
        # (and the same fusion inside a full single-frame ICP solve silently
        # returns wrong correspondences instead — a miscompilation, not OOM)
        from pointcloud_slam_tpu.register import icp as icpm

        cfg = register.ICPConfig(search_every=10, warmup_searches=0)
        coef, valid = jax.jit(
            lambda s: icpm.correspondences(cfg, grid_cfg, grid, s, jnp.ones(s.shape[1], bool))
        )(src)
        print("OK", int(jnp.sum(valid)))
    elif case == "icp":
        cfg = register.ICPConfig(solver=register.SolverConfig(max_iterations=iters))
        res = register.point_to_plane_icp(grid_cfg, grid, src, mask, cfg=cfg)
        jax.block_until_ready(res.pose.t)
        print("OK", np.asarray(res.pose.t).round(4).tolist())
    elif case == "batched1":
        cfg = register.ICPConfig(solver=register.SolverConfig(max_iterations=iters))
        pose, conv, iters_ = register.batched_point_to_plane_icp(
            grid_cfg, grid, src[None], mask[None], cfg=cfg
        )
        jax.block_until_ready(pose.t)
        print("OK", np.asarray(pose.t[0]).round(4).tolist())
    else:
        raise SystemExit(f"unknown case {case}")


def bisect(matrix: str = "full"):
    # (case, n, iters, baked, pts, nearby, capacity); pts/nearby 0 = defaults
    cases = []
    if matrix == "corr":
        # focused matrix for the r3-refined crash shape: knn+plane-fit fusion
        # over a baked grid, bench layout (pts 28, nearby 7, cap 2^17)
        for n in (2048, 8192, 20480):
            cases.append(("corr", n, 30, True, 28, 7, 1 << 17))
        cases.append(("corr", 20480, 30, False, 4, 7, 1 << 17))   # unbaked control
        cases.append(("corr", 20480, 30, True, 48, 1, 1 << 15))   # nearby-1 bake
        cases.append(("knn", 20480, 30, True, 28, 7, 1 << 17))    # knn alone
    else:
        for case in ("knn", "icp", "batched1"):
            for n in (2048, 8192, 20480):
                cases.append((case, n, 30, True, 0, 0, 1 << 15))
        # control: unbaked versions of the reported failure point
        cases.append(("icp", 20480, 30, False, 0, 0, 1 << 15))
        # iteration-count sensitivity on the baked solve
        for iters in (1, 4, 12):
            cases.append(("icp", 20480, iters, True, 0, 0, 1 << 15))
    print(f"{'case':10s} {'N':>6s} {'iters':>5s} {'baked':>5s} {'pts':>4s} {'nb':>3s}  outcome")
    for case, n, iters, baked, pts, nearby, cap in cases:
        cmd = [sys.executable, os.path.abspath(__file__), "--case", case,
               "--n", str(n), "--iters", str(iters), "--capacity", str(cap),
               "--pts", str(pts), "--nearby", str(nearby)]
        if not baked:
            cmd.append("--unbaked")
        try:
            p = subprocess.run(cmd, capture_output=True, text=True, timeout=600)
            if p.returncode == 0:
                out = p.stdout.strip().splitlines()[-1] if p.stdout.strip() else "OK"
            else:
                tail = (p.stderr.strip().splitlines() or ["?"])[-1][:120]
                out = f"CRASH rc={p.returncode}: {tail}"
        except subprocess.TimeoutExpired:
            out = "TIMEOUT"
        print(f"{case:10s} {n:6d} {iters:5d} {str(baked):>5s} {pts:4d} {nearby:3d}  {out}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--case", default="")
    p.add_argument("--n", type=int, default=20480)
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--capacity", type=int, default=1 << 15)
    p.add_argument("--pts", type=int, default=0, help="pts_per_voxel override")
    p.add_argument("--nearby", type=int, default=0, help="stencil override")
    p.add_argument("--unbaked", action="store_true")
    p.add_argument("--bisect", action="store_true")
    p.add_argument("--matrix", default="full", choices=("full", "corr"))
    args = p.parse_args()
    if args.bisect:
        bisect(args.matrix)
    else:
        run_case(args.case, args.n, args.iters, not args.unbaked, args.capacity,
                 pts=args.pts, nearby=args.nearby)


if __name__ == "__main__":
    main()
