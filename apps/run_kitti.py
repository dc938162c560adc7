#!/usr/bin/env python
"""KITTI odometry runner — the fast_gicp kitti.cpp role.

Behavioral parity target: `src/pointcloud_match/fast_gicp/src/kitti.cpp:22-155`
(load KITTI velodyne .bin frames, voxel-downsample, frame-to-model GICP with
the previous delta as the initial guess, accumulate the trajectory, save
KITTI-format poses).

Input: --data_dir containing KITTI `velodyne/*.bin` (float32 x,y,z,intensity
records) or any directory of `*.pcd` frames. Output: poses in KITTI format
(row-major 3x4 per line) + FPS report.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np
import jax
import jax.numpy as jnp


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("data_dir", help="KITTI sequence dir (velodyne/*.bin) or dir of *.pcd")
    p.add_argument("--out", default="kitti_poses.txt")
    p.add_argument("--algo", default="vgicp", choices=["vgicp", "ndt", "icp"])
    p.add_argument("--leaf", type=float, default=0.25, help="downsample leaf (kitti.cpp uses 0.25)")
    p.add_argument("--n_points", type=int, default=30_000)
    p.add_argument("--max_frames", type=int, default=0)
    from pointcloud_slam_tpu.utils import runtime
    runtime.add_platform_arg(p)
    return p.parse_args()


def read_kitti_bin(path):
    pts = np.fromfile(path, np.float32).reshape(-1, 4)
    return pts[:, :3]


def frame_paths(data_dir):
    vd = os.path.join(data_dir, "velodyne")
    if os.path.isdir(vd):
        return [os.path.join(vd, f) for f in sorted(os.listdir(vd)) if f.endswith(".bin")]
    return [os.path.join(data_dir, f) for f in sorted(os.listdir(data_dir)) if f.endswith((".bin", ".pcd"))]


def load_frame(path):
    if path.endswith(".bin"):
        return read_kitti_bin(path)
    from pointcloud_slam_tpu.io import pcd as pcdio

    return pcdio.read_pcd_xyz(path)


def main():
    args = parse_args()
    from pointcloud_slam_tpu.utils import runtime
    runtime.select_platform(args.platform)
    from pointcloud_slam_tpu import ops, register
    from pointcloud_slam_tpu.geom import se3
    from pointcloud_slam_tpu.utils import checkpoint as ck

    paths = frame_paths(args.data_dir)
    if args.max_frames:
        paths = paths[: args.max_frames]
    assert paths, f"no frames under {args.data_dir}"
    print(f"{len(paths)} frames, algo={args.algo}")

    N = args.n_points
    ds = jax.jit(lambda p, m: ops.voxel_downsample(p, m, args.leaf))

    def fixed_cloud(raw):
        """Downsample on device, then pad/crop to the static N."""
        P = len(raw)
        cap = max(N, 1 << int(np.ceil(np.log2(max(P, 1)))))
        buf = np.zeros((3, cap), np.float32)
        buf[:, :P] = raw.T
        m = np.arange(cap) < P
        pts_d, mask_d = ds(jnp.asarray(buf), jnp.asarray(m))
        pts_d = np.asarray(pts_d)
        mask_d = np.asarray(mask_d)
        sel = np.where(mask_d)[0][:N]
        out = np.zeros((3, N), np.float32)
        out[:, : len(sel)] = pts_d[:, sel]
        mm = np.zeros(N, bool)
        mm[: len(sel)] = True
        return jnp.asarray(out), jnp.asarray(mm)

    # frame-to-model: register each frame against the previous (downsampled)
    # frame with the last delta as the initial guess (kitti.cpp's strategy)
    vcfg = register.VGICPConfig(resolution=1.0)
    ncfg = register.NDTConfig(resolution=2.0)
    icfg = register.ICPConfig(max_corr_dist=3.0)
    grid_pts = ops.GridConfig(capacity=1 << 16, pts_per_voxel=8, resolution=1.0, nearby=19)

    pose = se3.identity()
    delta = se3.identity()
    poses_R, poses_t = [np.eye(3, dtype=np.float32)], [np.zeros(3, np.float32)]
    prev = None
    t0 = time.perf_counter()
    for k, path in enumerate(paths):
        cur, cur_m = fixed_cloud(load_frame(path))
        if prev is not None:
            tgt, tgt_m = prev
            if args.algo == "vgicp":
                gcfg, gmap = register.vgicp.build_target(vcfg, tgt, tgt_m, capacity=1 << 15)
                cov = register.source_covariances_rbf(cur, cur_m, resolution=1.0, kernel_width=0.5)
                res = register.vgicp.align(gcfg, gmap, cur, cov, cur_m, delta, cfg=vcfg)
            elif args.algo == "ndt":
                gcfg, gmap = register.ndt.build_target(ncfg, tgt, tgt_m, capacity=1 << 15)
                res = register.ndt.align(gcfg, gmap, cur, cur_m, delta, cfg=ncfg)
            else:
                _, pmap = register.build_target_map(tgt, tgt_m, grid_cfg=grid_pts)
                res = register.point_to_plane_icp(grid_pts, pmap, cur, cur_m, delta, cfg=icfg)
            dR = np.asarray(res.pose.R)
            dt = np.asarray(res.pose.t)
            delta = res.pose
            Rn = poses_R[-1] @ dR
            tn = poses_R[-1] @ dt + poses_t[-1]
            poses_R.append(Rn.astype(np.float32))
            poses_t.append(tn.astype(np.float32))
        prev = (cur, cur_m)
        if (k + 1) % 50 == 0:
            el = time.perf_counter() - t0
            print(f"  frame {k + 1}/{len(paths)}  FPS {k / max(el, 1e-9):.2f}")
    wall = time.perf_counter() - t0
    print(f"done: {len(paths)} frames, {len(paths) / max(wall, 1e-9):.2f} FPS")
    ck.save_poses_kitti(args.out, poses_R, poses_t)
    print(f"KITTI poses -> {args.out}")


if __name__ == "__main__":
    main()
