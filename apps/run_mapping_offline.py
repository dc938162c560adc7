#!/usr/bin/env python
"""Offline LIO mapping replay — the reference's `run_mapping_offline` app.

Behavioral parity target: `src/jueying_lio/app/run_mapping_offline.cc:26-98`
(gflags --config_file --bag_file --time_log_file --traj_log_file; rosbag
replay -> LaserMapping::Run per frame; FPS report; Savetrajectory +
Timer::PrintAll/DumpIntoFile at exit).

Input: a dataset directory with per-frame PCDs (`frame_%06d.pcd`, optional
`times.txt` point-time offsets) + `imu.csv` (t, ax, ay, az, gx, gy, gz), or
`--synthetic N` to replay a generated sequence. Output: TUM trajectory, map
PCD, timing CSV.
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
    p.add_argument("--config_file", default="", help="YAML with lio params")
    p.add_argument("--bag_file", default="", help="ROS1 bag to replay (CustomMsg/PointCloud2 + Imu)")
    p.add_argument("--lidar_topic", default="", help="bag lidar topic (default: any lidar-typed topic)")
    p.add_argument("--imu_topic", default="", help="bag IMU topic (default: any sensor_msgs/Imu)")
    p.add_argument("--bag_reader", default="auto", choices=("auto", "native", "python"),
                   help="bag parser: native C++ (bagreader.cpp), pure Python (io.rosbag), "
                        "or auto (native with Python fallback for bz2 chunks)")
    p.add_argument("--data_dir", default="", help="dataset directory (PCD frames + imu.csv)")
    p.add_argument("--synthetic", type=int, default=0, help="replay N synthetic frames instead")
    p.add_argument("--traj_log_file", default="traj.txt")
    p.add_argument("--time_log_file", default="time.csv")
    p.add_argument("--map_file", default="", help="save accumulated map PCD here")
    p.add_argument("--n_points", type=int, default=8192)
    p.add_argument("--n_imu", type=int, default=64)
    p.add_argument("--chain", type=int, default=8, help="frames per jitted chain "
                   "(1 = per-frame dispatch; larger amortizes the device round trip)")
    p.add_argument("--auto_grid", action="store_true",
                   help="size the map grid from the first scan's measured point "
                        "spacing (ops/tuning.py) instead of the config defaults")
    from pointcloud_slam_tpu.utils import runtime
    runtime.add_platform_arg(p)
    return p.parse_args()


def build_config(args):
    from pointcloud_slam_tpu import ops
    from pointcloud_slam_tpu.models import lio
    from pointcloud_slam_tpu.utils import config as cfgio

    kw = {}
    grid_kw = {}
    if args.config_file:
        y = cfgio.load_yaml(args.config_file)
        m = y.get("mapping", y)
        top = y
        # top-level scalars live beside the sections in the per-lidar YAMLs
        def pick(key, section=None):
            src = section if section is not None else top
            return src.get(key, top.get(key))

        if pick("filter_size_surf") is not None:
            kw["scan_leaf"] = float(pick("filter_size_surf"))
        if pick("filter_size_map") is not None:
            kw["map_leaf"] = float(pick("filter_size_map"))
        if pick("max_iteration") is not None:
            kw["max_iterations"] = int(pick("max_iteration"))
        if pick("esti_plane_threshold") is not None:
            kw["plane_threshold"] = float(pick("esti_plane_threshold"))
        if pick("ivox_grid_resolution") is not None:
            grid_kw["resolution"] = float(pick("ivox_grid_resolution"))
        if pick("ivox_nearby_type") is not None:
            grid_kw["nearby"] = {6: 7, 18: 19, 26: 27}.get(int(pick("ivox_nearby_type")), 7)
        if pick("ivox_node_phc_order") is not None:
            # PHC node variant (the reference's IVOX_NODE_TYPE_PHC build mode,
            # ivox3d_node.hpp): sub-voxel Hilbert centroid merge on insert
            kw["phc_order"] = int(pick("ivox_node_phc_order"))
        if "extrinsic_est_en" in m:
            kw["extrinsic_est"] = bool(m["extrinsic_est_en"])
        for src_k, dst_k in [("acc_cov", "acc_cov"), ("gyr_cov", "gyr_cov"),
                             ("b_acc_cov", "b_acc_cov"), ("b_gyr_cov", "b_gyr_cov")]:
            if src_k in m:
                kw[dst_k] = float(m[src_k])
        if "extrinsic_T" in m:
            kw["extrinsic_T"] = tuple(float(v) for v in m["extrinsic_T"])
        if "extrinsic_R" in m:
            kw["extrinsic_R"] = tuple(float(v) for v in m["extrinsic_R"])
    if grid_kw:
        kw["grid"] = ops.GridConfig(capacity=1 << 17, pts_per_voxel=8, **{"nearby": 7, **grid_kw})
    return lio.LIOConfig(**kw)


def _imu_window(imu, t0, t1):
    """imu rows (t, ax..az, gx..gz): measurements whose interval lies in
    [t0, t1), stamped at their interval END (the ImuProcess convention —
    see frames_from_dir)."""
    t_all = imu[:, 0]
    dt_all = np.diff(t_all, append=t_all[-1] + (t_all[-1] - t_all[-2] if len(t_all) > 1 else 0.005))
    sel = (t_all >= t0) & (t_all < t1)
    chunk = imu[sel]
    t_end = (t_all[sel] - t0) + dt_all[sel]
    return chunk, t_end


def frames_from_bag(args):
    """Replay a recorded ROS1 bag (the reference's primary input:
    run_mapping_offline.cc:46-82 iterates rosbag records and dispatches
    CustomMsg / PointCloud2 / Imu callbacks). Livox CustomMsg scans go
    through the livox_repub conversion; PointCloud2 schemas keep their
    vendor fields so per-point times resolve by the usual priority chain.

    Reader selection (--bag_reader): 'native' = the C++ reader
    (native/src/bagreader.cpp — the reference's replay input is native
    rosbag C++ too); 'python' = io.rosbag; 'auto' prefers native and falls
    back to Python for bags it can't take (bz2 chunks)."""
    from pointcloud_slam_tpu.io import converters, feed

    imu_rows, scans = [], []
    reader_used = getattr(args, "bag_reader", "auto")
    if reader_used in ("auto", "native"):
        from pointcloud_slam_tpu import native

        try:
            with native.NativeBagReader(args.bag_file, args.lidar_topic, args.imu_topic) as nb:
                for kind, payload in nb:
                    if kind == "imu":
                        t, acc, gyro = payload
                        imu_rows.append([t, *acc, *gyro])
                    else:
                        stamp, xyz, t_abs, _intensity, ring = payload
                        # time_source 0 = no per-point channel: let the Python
                        # priority chain try ring/yaw synthesis below
                        scans.append((stamp, xyz, (t_abs - stamp).astype(np.float32),
                                      ring, nb.cloud_time_source))
        except ValueError as e:
            if reader_used == "native":
                raise SystemExit(f"native bag reader: {e}")
            reader_used = "python"  # e.g. bz2 chunks
        else:
            reader_used = "native"
    if reader_used != "native":
        from pointcloud_slam_tpu.io import rosbag

        for topic, typ, _t, msg in rosbag.read_bag(args.bag_file):
            if typ == "sensor_msgs/Imu":
                if not args.imu_topic or topic == args.imu_topic:
                    imu_rows.append([msg["stamp"], *msg["acc"], *msg["gyro"]])
            elif not args.lidar_topic or topic == args.lidar_topic:
                if typ.endswith("CustomMsg"):
                    cloud = converters.livox_custom_to_xyzirt(
                        msg["x"], msg["y"], msg["z"], msg["reflectivity"],
                        msg["line"], msg["offset_time"])
                else:
                    cloud = msg
                pts = np.stack([cloud["x"], cloud["y"], cloud["z"]], axis=1).astype(np.float32)
                scans.append((msg["stamp"], pts, cloud, None, None))
    if not scans:
        raise SystemExit(f"{args.bag_file}: no lidar scans found"
                         + (f" on topic {args.lidar_topic}" if args.lidar_topic else ""))
    if not imu_rows:
        raise SystemExit(f"{args.bag_file}: no IMU messages found"
                         + (f" on topic {args.imu_topic}" if args.imu_topic else "")
                         + " — the LIO loop needs sensor_msgs/Imu covering every scan")
    imu = np.asarray(imu_rows, np.float64).reshape(-1, 7)
    scans.sort(key=lambda s: s[0])
    for k, (t0, pts, third, ring, tsrc) in enumerate(scans):
        t1 = scans[k + 1][0] if k + 1 < len(scans) else t0 + 0.1
        chunk, t_end = _imu_window(imu, t0, t1)
        if tsrc is None:          # python path: third = cloud dict
            pts = np.ascontiguousarray(pts, np.float32)
            t_offs = converters.point_times_from_cloud(third, scan_duration=float(t1 - t0))
        elif tsrc == 0:
            # the native reader found no per-point time channel (its ramp
            # fallback hard-codes 0.1 s): redo the Python priority chain with
            # the ACTUAL inter-scan gap — ring/yaw synthesis when rings
            # exist, else a correctly-scaled linear ramp (keeps native and
            # python reader trajectories identical on timestamp-less bags)
            cloud = {"x": pts[:, 0], "y": pts[:, 1], "z": pts[:, 2]}
            if ring is not None and np.any(ring):
                cloud["ring"] = ring
            t_offs = converters.point_times_from_cloud(cloud, scan_duration=float(t1 - t0))
        else:
            t_offs = third
        yield feed.make_frame(
            pts, t_offs, chunk[:, 1:4].astype(np.float32), chunk[:, 4:7].astype(np.float32),
            t_end.astype(np.float32), args.n_points, args.n_imu, prev_imu_t=0.0,
        ), t1


def frames_from_dir(args):
    """Replay frame_%06d.pcd + imu.csv. Per-point time offsets come from the
    PCD's own fields when present (time/t/timestamp/curvature/ring synthesis,
    converters.point_times_from_cloud) — the reference reads them from the
    vendor point type (pointcloud_preprocess.cc:89-305); a linear ramp over
    the scan duration is the last-resort fallback for timestamp-less dumps."""
    from pointcloud_slam_tpu.io import converters, feed, pcd

    imu = np.loadtxt(os.path.join(args.data_dir, "imu.csv"), delimiter=",")
    frame_files = sorted(f for f in os.listdir(args.data_dir) if f.startswith("frame_") and f.endswith(".pcd"))
    scan_times = np.loadtxt(os.path.join(args.data_dir, "scan_times.txt"))
    for k, name in enumerate(frame_files):
        cloud = pcd.read_pcd(os.path.join(args.data_dir, name))
        pts = np.stack([cloud["x"], cloud["y"], cloud["z"]], axis=1).astype(np.float32)
        t0 = scan_times[k]
        t1 = scan_times[k + 1] if k + 1 < len(scan_times) else t0 + 0.1
        # imu.csv rows are (t_i, measurement at t_i); sample i drives the
        # state from t_i to t_{i+1} (the ImuProcess convention). The frame
        # wants the measurements whose INTERVAL lies in [t0, t1), stamped at
        # their interval END (make_frame's imu_t are post-step offsets —
        # see io.synthetic.simulate_lio_sequence, the convention oracle).
        chunk, t_end = _imu_window(imu, t0, t1)
        t_offs = converters.point_times_from_cloud(cloud, scan_duration=float(t1 - t0))
        yield feed.make_frame(
            pts, t_offs, chunk[:, 1:4].astype(np.float32), chunk[:, 4:7].astype(np.float32),
            t_end.astype(np.float32), args.n_points, args.n_imu, prev_imu_t=0.0,
        ), t1


def frames_synthetic(args):
    from pointcloud_slam_tpu.io.synthetic import simulate_lio_sequence as simulate_sequence

    _, traj, frames = simulate_sequence(n_frames=args.synthetic, n_pts=min(args.n_points, 4000))
    for k, (fr, pos, R) in enumerate(frames):
        yield fr, (k + 1) * traj["frame_dt"]


def main():
    args = parse_args()
    from pointcloud_slam_tpu.utils import runtime
    runtime.select_platform(args.platform)
    from pointcloud_slam_tpu.geom import so3
    from pointcloud_slam_tpu.models import lio
    from pointcloud_slam_tpu.utils import checkpoint as ck
    from pointcloud_slam_tpu.utils.timer import Timer

    cfg = build_config(args)
    if args.bag_file:
        src = frames_from_bag(args)
    elif args.data_dir:
        src = frames_from_dir(args)
    else:
        src = frames_synthetic(args)
    if args.auto_grid:
        # measure the first scan's point spacing and size the map grid to it
        # (ops/tuning.py): the robust fallback when no per-lidar YAML matches
        # the sensor (sparse scans + fine voxels starve the plane fit). The
        # probed frame is chained back so the dataset is parsed once.
        import dataclasses as _dc
        import itertools

        from pointcloud_slam_tpu.ops import tuning

        first = next(src)
        src = itertools.chain([first], src)
        g = tuning.suggest_grid(np.asarray(first[0].pts), np.asarray(first[0].pt_mask),
                                capacity=cfg.grid.capacity, pts_per_voxel=cfg.grid.pts_per_voxel)
        print(f"auto_grid: resolution {g.resolution} m, stencil {g.nearby}")
        cfg = _dc.replace(cfg, grid=g)
    state = lio.create_state(cfg)
    step = jax.jit(lambda s, f: lio.lio_step(cfg, s, f))
    # chained streaming: C frames advance inside ONE program (lax.scan) with a
    # single device->host readback at the end — the tunnel's fixed per-program
    # round trip (~40 ms) is paid once per chain instead of once per frame,
    # exactly the run_mapping_offline.cc replay-at-full-speed shape
    step_chain = jax.jit(
        lambda s, fs: jax.lax.scan(lambda st, fr: lio.lio_step(cfg, st, fr), s, fs)
    )
    times, poss, quats = [], [], []
    n = 0
    t_start = time.perf_counter()
    pending = []

    def flush(state, pending):
        nonlocal n
        if not pending:
            return state
        if len(pending) == args.chain:
            stack = jax.tree.map(lambda *xs: jnp.stack(xs), *[f for f, _ in pending])

            def run():
                s, outs = step_chain(state, stack)
                return s, jax.tree.map(np.asarray, outs)

            state, outs = Timer.evaluate(run, "lio_chain")
            for i, (_, stamp) in enumerate(pending):
                times.append(stamp)
                poss.append(outs.pos[i])
                quats.append(np.asarray(so3.to_quat(jnp.asarray(outs.rot[i]))))
                n += 1
        else:  # tail group: per-frame path (already compiled shapes)
            for frame, stamp in pending:
                def run():
                    return step(state, frame)

                state, out = Timer.evaluate(run, "lio_step")
                times.append(stamp)
                poss.append(np.asarray(out.pos))
                quats.append(np.asarray(so3.to_quat(out.rot)))
                n += 1
        return state

    for frame, stamp in src:
        if args.chain > 1:
            pending.append((frame, stamp))
            if len(pending) == args.chain:
                state = flush(state, pending)
                pending = []
        else:
            def run():
                return step(state, frame)

            state, out = Timer.evaluate(run, "lio_step")
            times.append(stamp)
            poss.append(np.asarray(out.pos))
            quats.append(np.asarray(so3.to_quat(out.rot)))
            n += 1
    state = flush(state, pending)
    wall = time.perf_counter() - t_start
    print(f"frames: {n}  wall: {wall:.2f}s  mean FPS: {n / max(wall, 1e-9):.2f}")
    Timer.print_all()
    if args.time_log_file:
        Timer.dump_into_file(args.time_log_file)
    if args.traj_log_file:
        ck.save_trajectory_tum(args.traj_log_file, times, poss, quats)
        print(f"trajectory -> {args.traj_log_file}")
    if args.map_file:
        from pointcloud_slam_tpu.io import pcd as pcdio

        grid = state.grid
        pts = np.asarray(grid.pts).reshape(3, -1).T
        cnt = np.asarray(grid.npts)
        K = grid.pts.shape[1]
        # block row k of a slot is valid iff k < npts[slot]
        rows = np.repeat(np.arange(K)[:, None], grid.pts.shape[2], axis=1)
        mask = (rows < cnt[None, :]).reshape(-1)
        pcdio.write_pcd(args.map_file, pts[mask])
        print(f"map ({mask.sum()} pts) -> {args.map_file}")


if __name__ == "__main__":
    main()
