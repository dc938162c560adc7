#!/usr/bin/env python
"""Ablation probe for slam_step cost on TPU (dev tool).

Times the REAL 32-frame config-6 pipeline under single-knob ablations so the
per-stage budget is measured inside the pipeline (microbenchmarks are
DCE-unreliable on this stack — ROUND_NOTES session-6 fact #3):

  full                 the bench config 6 shape
  no_window            window_update=False (drops the per-keyframe W=32 solve)
  no_loops             rs_loop=False + SC detect bypassed (keeps keyframe adds)
  no_kf                keyframe_dist_thresh huge: scan_to_map only
  s2m_itersN           solver max_iterations=N (e.g. s2m_iters10)
  sched_W_E_I          warmup_searches=W, search_every=E, max_iterations=I
                       (the scan-to-map search/iteration schedule sweep)
  unbaked              unbaked corner/surf grids (the pre-session-6 shape)

Unknown variant names raise (a typo must not silently probe the baseline).
"""
import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import dataclasses  # noqa: E402

from pointcloud_slam_tpu import ops  # noqa: E402
from pointcloud_slam_tpu.io import synthetic  # noqa: E402
from pointcloud_slam_tpu.models.liosam import backend as bk  # noqa: E402
from pointcloud_slam_tpu.models.liosam import scan2map as s2m  # noqa: E402
from pointcloud_slam_tpu.models.liosam import slam  # noqa: E402


def soa(x):
    return jnp.asarray(np.ascontiguousarray(np.asarray(x).T))


def build_frames(n_frames, n_corner, n_surf):
    corners_w, surfs_w = synthetic.make_feature_world()
    cs, cms, ss, sms, gts = [], [], [], [], []
    for k in range(n_frames):
        ang = 0.04 * k
        t = np.array([6.0 * np.cos(ang) - 6.0, 6.0 * np.sin(ang), 1.0], np.float32)
        R = np.eye(3, dtype=np.float32)
        c, cm = synthetic.take_scan(corners_w, R, t, n_corner, seed=k)
        s, sm = synthetic.take_scan(surfs_w, R, t, n_surf, seed=1000 + k)
        cs.append(soa(c)); cms.append(jnp.asarray(cm)); ss.append(soa(s)); sms.append(jnp.asarray(sm))
        gts.append(t)
    return jnp.stack(cs), jnp.stack(cms), jnp.stack(ss), jnp.stack(sms), np.stack(gts)


def make_cfg(variant):
    base_s2m = s2m.Scan2MapConfig()
    grids = dict(
        corner_grid=s2m.baked_grid(base_s2m.corner_grid),
        surf_grid=s2m.baked_grid(base_s2m.surf_grid),
    )
    kf_thresh = 0.3
    window_update = True
    rs_loop = True
    sol = base_s2m.solver
    if variant == "no_window":
        window_update = False
    elif variant == "no_loops":
        rs_loop = False
    elif variant == "no_kf":
        kf_thresh = 1e9
    elif variant.startswith("s2m_iters"):
        sol = dataclasses.replace(sol, max_iterations=int(variant[len("s2m_iters"):]))
    elif variant.startswith("sched_"):
        # sched_W_E_I: warmup_searches=W, search_every=E, max_iterations=I
        w, e, i = (int(x) for x in variant.split("_")[1:])
        sol = dataclasses.replace(sol, max_iterations=i)
        base_s2m = dataclasses.replace(base_s2m, warmup_searches=w, search_every=e)
    elif variant == "unbaked":
        grids = dict(corner_grid=base_s2m.corner_grid, surf_grid=base_s2m.surf_grid)
    elif variant != "full":
        raise ValueError(f"unknown variant {variant!r}")
    cfg = slam.SLAMConfig(
        backend=bk.BackendConfig(max_keyframes=128, max_loops=16,
                                 keyframe_dist_thresh=kf_thresh, gn_iterations=3, pcg_iterations=24),
        n_corner=512, n_surf=2048,
        scan2map=dataclasses.replace(base_s2m, solver=sol, **grids),
        window_update=window_update,
        rs_loop=rs_loop,
    )
    if variant == "no_loops":
        # also neuter the SC channel by an impossible threshold
        cfg = dataclasses.replace(
            cfg, scancontext=dataclasses.replace(cfg.scancontext, dist_threshold=-1.0))
    return cfg


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=32)
    ap.add_argument("--variants", default="full,no_window,no_loops,no_kf,s2m_iters10")
    ap.add_argument("--platform", default="")
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    cs, cms, ss, sms, gts = build_frames(args.frames, 512, 2048)

    for variant in args.variants.split(","):
        cfg = make_cfg(variant)

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
        err = np.linalg.norm(ts_np[-1] - (gts[-1] - gts[0]))
        reps = 3
        t0 = time.perf_counter()
        for _ in range(reps):
            _, (ts, _k) = run_all(state)
            _ = np.asarray(ts)
        dt = (time.perf_counter() - t0) / (reps * args.frames)
        print(f"{variant:16s} {dt*1e3:7.3f} ms/frame ({1/dt:6.1f} fps)  "
              f"kf={int(np.asarray(kfs).sum())}  final_err={err:.3f} m", flush=True)


if __name__ == "__main__":
    main()
