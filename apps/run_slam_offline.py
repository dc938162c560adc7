#!/usr/bin/env python
"""Offline LIO-SAM style SLAM replay — the mapOptimization-node role.

Behavioral parity target: `src/jueying_slam/src/mapOptmization.cpp`
(laserCloudInfoHandler pipeline + saveKeyFramesAndFactor artifact
persistence :1868-1880 + saveOptimizedVerticesKITTIformat :31-54), driven the
way `run_mapping_offline.cc` drives the LIO app: replay -> per-frame step ->
trajectory + artifacts at exit.

Pipeline per frame (one jitted chain): range-image projection
(imageProjection.cpp role) -> LOAM feature extraction
(featureExtraction.cpp role) -> slam_step (scan-to-map + keyframes + dual
loop closure + pose graph). Keyframe artifacts (Scans/*.pcd + SCDs/*.scd),
the g2o pose graph, and TUM/KITTI trajectories are written on the host.

Inputs: --data_dir with frame_%06d.pcd (XYZIRT; per-point times optional) or
--synthetic N. Outputs under --out_dir.
"""

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np
import jax
import jax.numpy as jnp


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--data_dir", default="")
    p.add_argument("--bag_file", default="", help="ROS1 bag to replay (PointCloud2/CustomMsg scans)")
    p.add_argument("--lidar_topic", default="", help="bag lidar topic (default: any lidar-typed topic)")
    p.add_argument("--synthetic", type=int, default=0)
    p.add_argument("--out_dir", default="slam_out")
    p.add_argument("--n_corner", type=int, default=512)
    p.add_argument("--n_surf", type=int, default=2048)
    p.add_argument("--max_keyframes", type=int, default=512)
    p.add_argument("--baked_grids", type=int, default=1,
                   help="stencil-baked corner/surf local maps (one-gather kNN "
                        "inside scan2map; measured 27.9 -> 19.6 ms/keyframe "
                        "on v5e). 0 = the unbaked reference layout")
    p.add_argument("--save_artifacts", action="store_true", help="per-keyframe Scans/SCDs")
    p.add_argument("--debug", default="", help="comma-separated debug channels to record "
                   "(loop_constraints, effect_points) — the reference's debug-topic role "
                   "(mapOptmization.cpp:1020-1068); written as npz under <out_dir>/debug")
    from pointcloud_slam_tpu.utils import runtime
    runtime.add_platform_arg(p)
    return p.parse_args()


def cloud_source(args):
    """Yield (k, cloud-dict) scans from --bag_file (PointCloud2 any schema,
    or livox CustomMsg via the livox_repub conversion) or from a directory
    of frame_%06d.pcd files."""
    if args.bag_file:
        from pointcloud_slam_tpu.io import converters, rosbag

        k = 0
        for topic, typ, t_rec, msg in rosbag.read_bag(args.bag_file):
            if typ == "sensor_msgs/Imu":
                continue
            if args.lidar_topic and topic != args.lidar_topic:
                continue
            stamp = float(msg.get("stamp", t_rec))
            if typ.endswith("CustomMsg"):
                msg = converters.livox_custom_to_xyzirt(
                    msg["x"], msg["y"], msg["z"], msg["reflectivity"],
                    msg["line"], msg["offset_time"])
            # keep the scan time for the RS loop gate (the conversion drops it)
            msg["stamp"] = stamp
            yield k, msg
            k += 1
    else:
        from pointcloud_slam_tpu.io import pcd as pcdio

        frame_files = sorted(
            f for f in os.listdir(args.data_dir) if f.startswith("frame_") and f.endswith(".pcd")
        )
        for k, name in enumerate(frame_files):
            yield k, pcdio.read_pcd(os.path.join(args.data_dir, name))


def synthetic_frames(n):
    """Reuse the SLAM test world: a feature-rich yard + a loop trajectory."""
    from pointcloud_slam_tpu.io.synthetic import make_feature_world

    corners_w, surfs_w = make_feature_world(seed=1)
    for k in range(n):
        ang = 2 * np.pi * k / max(n - 1, 1)
        t = np.array([3.0 * np.sin(ang), 3.0 * (1 - np.cos(ang)), 1.0], np.float32)
        R = np.eye(3, dtype=np.float32)
        yield k * 0.1, corners_w, surfs_w, R, t


def main():
    args = parse_args()
    from pointcloud_slam_tpu.utils import runtime
    runtime.select_platform(args.platform)
    from pointcloud_slam_tpu.models.liosam import backend as bk
    from pointcloud_slam_tpu.models.liosam import features, projection, slam
    from pointcloud_slam_tpu.utils import checkpoint as ck
    from pointcloud_slam_tpu.utils import log as plog

    os.makedirs(args.out_dir, exist_ok=True)
    logger = plog.get_logger("slam")
    dbg = plog.DebugChannels(os.path.join(args.out_dir, "debug"),
                             enabled=[c for c in args.debug.split(",") if c])
    from pointcloud_slam_tpu.models.liosam import scan2map as s2m
    s2m_cfg = s2m.Scan2MapConfig()
    if args.baked_grids:
        s2m_cfg = dataclasses.replace(
            s2m_cfg,
            corner_grid=s2m.baked_grid(s2m_cfg.corner_grid),
            surf_grid=s2m.baked_grid(s2m_cfg.surf_grid),
        )
    cfg = slam.SLAMConfig(
        backend=bk.BackendConfig(max_keyframes=args.max_keyframes),
        n_corner=args.n_corner,
        n_surf=args.n_surf,
        scan2map=s2m_cfg,
    )
    pcfg = projection.ProjectionConfig()
    fcfg = features.FeatureConfig()
    state = slam.create_state(cfg)

    def soa(x):
        return jnp.asarray(np.ascontiguousarray(np.asarray(x, np.float32).T))

    @jax.jit
    def front_end(pts, mask):
        img = projection.project(pcfg, pts, mask)
        feats = features.extract(fcfg, img)
        cpts, cmask = features.gather_features(img, feats.edge_mask)
        spts, smask = features.gather_features(img, feats.surf_mask)
        return cpts, cmask, spts, smask

    # scan stamps feed the RS loop 30 s time gate (historyKeyframeSearchTimeDiff);
    # without caller stamps slam_step falls back to frame_idx * nominal_scan_period
    def make_step(c):
        return jax.jit(lambda st, cp, cm, sp, sm, t: slam.slam_step(c, st, cp, cm, sp, sm, time_sec=t))

    step = make_step(cfg)

    def maybe_grow(cfg, state, step):
        """Unbounded trajectories: double the keyframe/loop stores before they
        saturate (the reference's disk-backed unbounded keyframe store role,
        mapOptmization.cpp:249-263,1868-1880). One recompile per doubling."""
        if slam.needs_growth(cfg, state):
            old_kf = cfg.backend.max_keyframes
            cfg, state = slam.grow_state(cfg, state)
            logger.info("keyframe store grown %d -> %d (loops %d -> %d)",
                        old_kf, cfg.backend.max_keyframes,
                        cfg.backend.max_loops // 2, cfg.backend.max_loops)
            step = make_step(cfg)
        return cfg, state, step

    def fixed(pts, mask, n):
        """Top-n masked points into a fixed-shape cloud."""
        idx = np.argsort(~np.asarray(mask))[:n]
        out = np.zeros((3, n), np.float32)
        m = np.zeros(n, bool)
        sel = np.asarray(mask)[idx]
        out[:, : sel.sum()] = np.asarray(pts)[:, idx[sel]]
        m[: sel.sum()] = True
        return jnp.asarray(out), jnp.asarray(m)

    def record_debug(k, state, out):
        """Debug-topic analogues: loop-constraint pairs + endpoints
        (visualizeLoopClosure's MarkerArray role) and the matched keypose
        cloud (the effect-points cloud role)."""
        if bool(out.loop_detected) and dbg.enabled("loop_constraints"):
            nl = int(state.graph.n_loops)
            dbg.publish(
                "loop_constraints", k,
                pairs=np.stack([np.asarray(state.graph.loop_i)[:nl], np.asarray(state.graph.loop_j)[:nl]], 1),
                endpoints_i=np.asarray(state.graph.t)[np.asarray(state.graph.loop_i)[:nl]],
                endpoints_j=np.asarray(state.graph.t)[np.asarray(state.graph.loop_j)[:nl]],
            )
            logger.info("loop closure at frame %d (total %d)", k, nl)
        if bool(out.is_keyframe) and dbg.enabled("effect_points"):
            kk = int(state.graph.n) - 1
            m = np.asarray(state.kf_surf_mask[kk])
            dbg.publish("effect_points", k, pts=np.asarray(state.kf_surf[kk])[:, m])

    times, poss, rots = [], [], []
    t0_stamp = None
    n_loops = 0
    t_start = time.perf_counter()
    if args.synthetic:
        from pointcloud_slam_tpu.io.synthetic import take_scan

        for stamp, corners_w, surfs_w, R, t in synthetic_frames(args.synthetic):
            c, cm = take_scan(corners_w, R, t, cfg.n_corner, seed=int(stamp * 10))
            s, sm = take_scan(surfs_w, R, t, cfg.n_surf, seed=100 + int(stamp * 10))
            state, out = step(state, soa(c), jnp.asarray(cm), soa(s), jnp.asarray(sm),
                              jnp.asarray(stamp, jnp.float32))
            cfg, state, step = maybe_grow(cfg, state, step)
            times.append(stamp)
            poss.append(np.asarray(out.pose.t))
            rots.append(np.asarray(out.pose.R))
            n_loops += int(out.loop_detected)
            record_debug(int(stamp * 10), state, out)
            if args.save_artifacts and bool(out.is_keyframe):
                k = int(state.graph.n) - 1
                ck.save_keyframe_artifacts(
                    args.out_dir, k, state.kf_surf[k], state.kf_surf_mask[k], state.sc_descs[k],
                    state.kf_corner[k], state.kf_corner_mask[k],
                )
    else:
        for k, cloud in cloud_source(args):
            pts = np.stack([cloud["x"], cloud["y"], cloud["z"]], axis=0).astype(np.float32)
            N = pts.shape[1]
            cap = pcfg.n_scan * pcfg.horizon_scan if hasattr(pcfg, "n_scan") else N
            pad = jnp.asarray(np.concatenate([pts, np.zeros((3, max(0, cap - N)), np.float32)], 1)[:, :cap])
            m = jnp.asarray(np.arange(cap) < N)
            cpts, cmask, spts, smask = front_end(pad, m)
            c, cm = fixed(cpts, cmask, cfg.n_corner)
            s, sm = fixed(spts, smask, cfg.n_surf)
            stamp = float(cloud.get("stamp", float(k) * 0.1))
            if t0_stamp is None:
                t0_stamp = stamp
            # rebase in float64 BEFORE the float32 device scalar: ROS epoch
            # stamps (~1.7e9 s) have a 128 s float32 ULP, which would wreck
            # the RS 30 s time gate
            state, out = step(state, c, cm, s, sm, jnp.asarray(stamp - t0_stamp, jnp.float32))
            cfg, state, step = maybe_grow(cfg, state, step)
            times.append(stamp)
            poss.append(np.asarray(out.pose.t))
            rots.append(np.asarray(out.pose.R))
            n_loops += int(out.loop_detected)
            record_debug(k, state, out)
            if args.save_artifacts and bool(out.is_keyframe):
                kk = int(state.graph.n) - 1
                ck.save_keyframe_artifacts(
                    args.out_dir, kk, state.kf_surf[kk], state.kf_surf_mask[kk], state.sc_descs[kk],
                    state.kf_corner[kk], state.kf_corner_mask[kk],
                )

    dbg.close()
    wall = time.perf_counter() - t_start
    n = len(times)
    print(f"frames: {n}  keyframes: {int(state.graph.n)}  loops: {n_loops}  "
          f"wall: {wall:.1f}s  FPS: {n / max(wall, 1e-9):.2f}")

    from pointcloud_slam_tpu.geom import so3

    quats = [np.asarray(so3.to_quat(jnp.asarray(R))) for R in rots]
    ck.save_trajectory_tum(os.path.join(args.out_dir, "traj_tum.txt"), times, poss, quats)
    nkf = int(state.graph.n)
    ck.save_poses_kitti(
        os.path.join(args.out_dir, "poses_kitti.txt"),
        np.asarray(state.graph.R)[:nkf], np.asarray(state.graph.t)[:nkf],
    )
    ck.save_pose_graph_g2o(os.path.join(args.out_dir, "graph.g2o"), state.graph)
    print(f"outputs -> {args.out_dir}/ (traj_tum.txt, poses_kitti.txt, graph.g2o)")


if __name__ == "__main__":
    main()
