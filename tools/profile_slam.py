#!/usr/bin/env python
"""TPU timing of the LIO-SAM slam_step at product shapes (dev tool).

Chains frames inside one jitted lax.scan (a real keyframe trajectory on a
feature world) and reports ms/frame for unbaked vs baked corner/surf local
maps. Also checks the final pose error so a perf knob can't silently break
tracking.
"""
import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from pointcloud_slam_tpu import ops  # noqa: E402
from pointcloud_slam_tpu.io import synthetic  # noqa: E402
from pointcloud_slam_tpu.models.liosam import backend as bk  # noqa: E402
from pointcloud_slam_tpu.models.liosam import scan2map as s2m  # noqa: E402
from pointcloud_slam_tpu.models.liosam import slam  # noqa: E402


def soa(x):
    return jnp.asarray(np.ascontiguousarray(np.asarray(x).T))


def build_frames(n_frames, n_corner, n_surf):
    corners_w, surfs_w = synthetic.make_feature_world()
    gt = []
    for k in range(n_frames):
        ang = 0.04 * k
        t = np.array([6.0 * np.cos(ang) - 6.0, 6.0 * np.sin(ang), 1.0], np.float32)
        R = np.eye(3, dtype=np.float32)
        gt.append((R, t))
    cs, cms, ss, sms = [], [], [], []
    for k, (R, t) in enumerate(gt):
        c, cm = synthetic.take_scan(corners_w, R, t, n_corner, seed=k)
        s, sm = synthetic.take_scan(surfs_w, R, t, n_surf, seed=1000 + k)
        cs.append(soa(c)); cms.append(jnp.asarray(cm)); ss.append(soa(s)); sms.append(jnp.asarray(sm))
    return (jnp.stack(cs), jnp.stack(cms), jnp.stack(ss), jnp.stack(sms),
            np.stack([t for _, t in gt]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=32)
    ap.add_argument("--n_corner", type=int, default=512)
    ap.add_argument("--n_surf", type=int, default=2048)
    ap.add_argument("--platform", default="")
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    cs, cms, ss, sms, gt_t = build_frames(args.frames, args.n_corner, args.n_surf)

    def run(tag, corner_grid, surf_grid):
        cfg = slam.SLAMConfig(
            backend=bk.BackendConfig(max_keyframes=128, max_loops=16,
                                     keyframe_dist_thresh=0.3, gn_iterations=3, pcg_iterations=24),
            n_corner=args.n_corner, n_surf=args.n_surf,
            scan2map=s2m.Scan2MapConfig(corner_grid=corner_grid, surf_grid=surf_grid),
        )

        @jax.jit
        def run_all(state):
            def body(st, inp):
                c, cm, s, sm = inp
                st, out = slam.slam_step(cfg, st, c, cm, s, sm)
                return st, (out.pose.t, out.is_keyframe)
            return jax.lax.scan(body, state, (cs, cms, ss, sms))

        state = slam.create_state(cfg)
        st, (ts, kfs) = run_all(state)
        ts_np = np.asarray(ts)
        err = np.linalg.norm(ts_np[-1] - (gt_t[-1] - gt_t[0]))
        reps = 3
        t0 = time.perf_counter()
        for _ in range(reps):
            _, (ts, _k) = run_all(state)
            _ = np.asarray(ts)
        dt = (time.perf_counter() - t0) / (reps * args.frames)
        print(f"{tag:44s} {dt*1e3:7.3f} ms/frame ({1/dt:6.1f} fps)  "
              f"kf={int(np.asarray(kfs).sum())}  final_err={err:.3f} m", flush=True)

    run("unbaked (current default)",
        ops.GridConfig(capacity=1 << 15, pts_per_voxel=8, resolution=0.4, nearby=7),
        ops.GridConfig(capacity=1 << 16, pts_per_voxel=8, resolution=0.8, nearby=7))
    run("baked corner/surf",
        ops.GridConfig(capacity=1 << 15, pts_per_voxel=56, resolution=0.4, nearby=7, baked=True),
        ops.GridConfig(capacity=1 << 16, pts_per_voxel=56, resolution=0.8, nearby=7, baked=True))


if __name__ == "__main__":
    main()
