#!/usr/bin/env python
"""Localization soak: the deployed prior-map mode at lidar cadence.

The reference runs new_localization at lidar rate with a
MultiThreadedSpinner(6) (src/jueying_slam/src/new_localization.cpp:77-2081);
its real-time health is per-frame latency vs the 100 ms scan period plus
recovery behavior after loss. This soak drives feature-LOAM tile localization
(models/localization.localize_loam) frame-by-frame at wall-clock 10 Hz for
--seconds, injects a pose-loss event mid-run (teleported init, the
relocalization path), and prints one JSON line: p50/p90/p99/max latency,
deadline misses, loss/recovery counts, and final error.

Usage: python tools/soak_localization.py --seconds 60       # real-time
       python tools/soak_localization.py --seconds 5 --platform cpu  # smoke
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=60.0)
    ap.add_argument("--hz", type=float, default=10.0)
    ap.add_argument("--loss_at_frac", type=float, default=0.5,
                    help="inject a 5 m teleport at this fraction of the run")
    from pointcloud_slam_tpu.utils import runtime
    runtime.add_platform_arg(ap)
    args = ap.parse_args()
    runtime.select_platform(args.platform)

    from pointcloud_slam_tpu import ops, register
    from pointcloud_slam_tpu.geom import se3
    from pointcloud_slam_tpu.io import synthetic
    from pointcloud_slam_tpu.models.liosam import scan2map as s2m
    from pointcloud_slam_tpu.models.localization import pipeline as loc

    Nc, Ns = 512, 2048
    corners_w, surfs_w = synthetic.make_feature_world(seed=3)
    # degeneracy_eig=1.0: see bench config8 — the raw reference threshold
    # (100) over-clamps at the prior-map density and the chain lags/diverges
    cfg = loc.LocalizationConfig(
        scan2map=s2m.Scan2MapConfig(solver=register.SolverConfig(max_iterations=6),
                                    degeneracy_eig=1.0))
    # jitted map build: EAGER ops through the axon tunnel dispatch one op at
    # a time and can stall the whole process (see .claude verify notes)
    build_c = jax.jit(lambda p, m: ops.insert(cfg.scan2map.corner_grid,
                                              ops.create(cfg.scan2map.corner_grid), p, m))
    build_s = jax.jit(lambda p, m: ops.insert(cfg.scan2map.surf_grid,
                                              ops.create(cfg.scan2map.surf_grid), p, m))
    cmap = build_c(jnp.asarray(corners_w.T.astype(np.float32)),
                   jnp.ones(len(corners_w), bool))
    smap = build_s(jnp.asarray(surfs_w.T.astype(np.float32)),
                   jnp.ones(len(surfs_w), bool))
    print("maps built", flush=True)

    # ALL per-frame device math inside ONE jitted step: eager jnp arithmetic
    # (cv-init adds, jnp.eye) flips the axon tunnel into one-op-at-a-time
    # slow dispatch and the soak hangs (see memory: axon-tunnel-discipline)
    off = jnp.asarray([5.0, 5.0, 2.0], jnp.float32)

    @jax.jit
    def step(c, cm, s, sm, pose_R, pose_t, prev_t, teleport):
        init_t = pose_t + (pose_t - prev_t) + jnp.where(teleport, off, 0.0)
        res = loc.localize_loam(cfg, None, cmap, smap, c, cm, s, sm,
                                se3.Pose(pose_R, init_t))
        return res.pose.R, res.pose.t, res.lost, res.fitness

    @jax.jit
    def recover_step(c, cm, s, sm, fb_t):
        res = loc.localize_loam(cfg, None, cmap, smap, c, cm, s, sm,
                                se3.Pose(jnp.eye(3), fb_t))
        return res.pose.R, res.pose.t, res.lost

    n_frames = int(args.seconds * args.hz)
    period = 1.0 / args.hz
    loss_frame = int(n_frames * args.loss_at_frac)

    def scan_pose(k):
        ang = 2 * np.pi * (k % 240) / 240
        return np.array([3.0 * np.sin(ang), 3.0 * (1 - np.cos(ang)), 1.0], np.float32)

    def scan_at(t, k):
        c, cm = synthetic.take_scan(corners_w, np.eye(3, dtype=np.float32), t, Nc, seed=k % 97)
        s, sm = synthetic.take_scan(surfs_w, np.eye(3, dtype=np.float32), t, Ns, seed=1000 + k % 97)
        return (jnp.asarray(c.T.copy()), jnp.asarray(cm),
                jnp.asarray(s.T.copy()), jnp.asarray(sm))

    # warm both programs outside the paced loop (host pose state: numpy)
    gt0 = scan_pose(0)
    c, cm, s, sm = scan_at(gt0, 0)
    pose_R, pose_t = np.eye(3, dtype=np.float32), gt0.copy()
    prev_t = pose_t.copy()
    _ = jax.device_get(step(c, cm, s, sm, pose_R, pose_t, prev_t, False))
    _ = jax.device_get(recover_step(c, cm, s, sm, gt0))
    print("warm", flush=True)

    lats, misses, losses, recoveries = [], 0, 0, 0
    errs = []
    t_start = time.perf_counter()
    for k in range(n_frames):
        deadline = t_start + k * period
        now = time.perf_counter()
        if now < deadline:
            time.sleep(deadline - now)
        gt = scan_pose(k)
        c, cm, s, sm = scan_at(gt, k)
        t0 = time.perf_counter()
        R_n, t_n, lost, fit = jax.device_get(
            step(c, cm, s, sm, pose_R, pose_t, prev_t, k == loss_frame))
        lats.append((time.perf_counter() - t0) * 1e3)
        if bool(lost):
            losses += 1
            # relocalize from the external initial pose (GPS / initialPose
            # role, localization.cpp relocalization)
            R2, t2, lost2 = jax.device_get(recover_step(c, cm, s, sm, gt))
            if not bool(lost2):
                recoveries += 1
                prev_t = t2.copy()
                pose_R, pose_t = R2, t2
                t_n = t2
            else:
                prev_t = pose_t
        else:
            prev_t = pose_t
            pose_R, pose_t = R_n, t_n
        if (time.perf_counter() - t0) > period:
            misses += 1
        errs.append(float(np.linalg.norm(t_n - gt)))

    lats = np.asarray(lats)
    out = {
        "frames": n_frames,
        "latency_p50_ms": round(float(np.percentile(lats, 50)), 1),
        "latency_p90_ms": round(float(np.percentile(lats, 90)), 1),
        "latency_p99_ms": round(float(np.percentile(lats, 99)), 1),
        "latency_max_ms": round(float(lats.max()), 1),
        "deadline_misses": misses,
        "losses": losses,
        "recoveries": recoveries,
        "err_p50_m": round(float(np.percentile(errs, 50)), 4),
        "err_max_m": round(float(np.max(errs)), 4),
        "err_final_m": round(errs[-1], 4),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
