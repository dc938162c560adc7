#!/usr/bin/env python
"""Frame-step the bench config-6 revisit shape and report the first NaN.

The round-5 bench showed slam_final_err_m_revisit = NaN at KF=512/4096 while
every test (KF<=32, dense-tail-only) stays finite — this pins down which
frame and which state field first goes non-finite on the real shape.
Run: python tools/debug_revisit_nan.py [--platform cpu]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default="")
    ap.add_argument("--kf", type=int, default=512)
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import bench
    from pointcloud_slam_tpu.geom import se3
    from pointcloud_slam_tpu.models.liosam import backend as bk
    from pointcloud_slam_tpu.models.liosam import scan2map as s2m
    from pointcloud_slam_tpu.models.liosam import scancontext as scm
    from pointcloud_slam_tpu.models.liosam import slam
    from pointcloud_slam_tpu.io import synthetic

    KF, PRE = args.kf, args.kf - 32
    n_corner, n_surf, n_frames = 512, 2048, 32
    KF_DT = 0.5
    corners_w, surfs_w = synthetic.make_feature_world()
    cfg = slam.SLAMConfig(
        backend=bk.BackendConfig(max_keyframes=KF, max_loops=64,
                                 keyframe_dist_thresh=0.3, gn_iterations=3, pcg_iterations=24),
        n_corner=n_corner, n_surf=n_surf,
        scan2map=s2m.Scan2MapConfig(
            corner_grid=s2m.baked_grid(s2m.Scan2MapConfig().corner_grid),
            surf_grid=s2m.baked_grid(s2m.Scan2MapConfig().surf_grid),
        ),
    )

    def soa(x):
        return jnp.asarray(np.ascontiguousarray(np.asarray(x).T))

    eye3 = np.eye(3, dtype=np.float32)
    circle = lambda ang: np.array([6.0 * np.cos(ang) - 6.0, 6.0 * np.sin(ang), 1.0], np.float32)

    def scan_at(t, seed):
        c, cm = synthetic.take_scan(corners_w, eye3, t, n_corner, seed=seed)
        s, sm = synthetic.take_scan(surfs_w, eye3, t, n_surf, seed=1000 + seed)
        return c, cm, s, sm

    desc_fn = jax.jit(jax.vmap(lambda p, m: scm.make_descriptor(cfg.scancontext, p, m)))
    rebuild_jit = jax.jit(lambda state, pt: slam._rebuild_maps(cfg, state, state.graph, pt))

    KF_ANG = 0.04 * 1.5
    poses = np.stack([circle(KF_ANG * i) for i in range(PRE)]).astype(np.float32)
    clouds = [scan_at(poses[i], seed=6000 + i) for i in range(PRE)]

    state = slam.create_state(cfg)
    g = state.graph
    odom_t = np.zeros((KF, 3), np.float32)
    odom_t[1:PRE] = poses[1:] - poses[:-1]
    t_all = np.zeros((KF, 3), np.float32)
    t_all[:PRE] = poses
    oinfo = np.zeros((KF, 6), np.float32)
    oinfo[1:PRE] = np.concatenate([np.full(3, 1e6), np.full(3, 1e4)]).astype(np.float32)
    kf_c = np.zeros((KF, 3, n_corner), np.float32)
    kf_cm = np.zeros((KF, n_corner), bool)
    kf_s = np.zeros((KF, 3, n_surf), np.float32)
    kf_sm = np.zeros((KF, n_surf), bool)
    for i, (c, cm, s, sm) in enumerate(clouds):
        kf_c[i], kf_cm[i] = c.T, cm
        kf_s[i], kf_sm[i] = s.T, sm
    kf_s_j, kf_sm_j = jnp.asarray(kf_s), jnp.asarray(kf_sm)
    descs, keys = desc_fn(kf_s_j, kf_sm_j)
    kf_time = np.zeros((KF,), np.float32)
    kf_time[:PRE] = np.arange(PRE) * KF_DT
    g = g._replace(t=jnp.asarray(t_all), n=jnp.asarray(PRE, jnp.int32),
                   odom_t=jnp.asarray(odom_t), odom_info=jnp.asarray(oinfo))
    state = state._replace(
        graph=g, kf_corner=jnp.asarray(kf_c), kf_corner_mask=jnp.asarray(kf_cm),
        kf_surf=kf_s_j, kf_surf_mask=kf_sm_j, sc_descs=descs, sc_keys=keys,
        kf_time=jnp.asarray(kf_time),
        pose=se3.Pose(state.pose.R, jnp.asarray(poses[-1])),
        frame_idx=jnp.asarray(int(PRE * KF_DT / cfg.nominal_scan_period), jnp.int32),
    )
    cmap, smap = rebuild_jit(state, state.graph.t[PRE - 1])
    state = state._replace(corner_map=cmap, surf_map=smap)

    step1 = jax.jit(lambda st, c, cm, s, sm: slam.slam_step(cfg, st, c, cm, s, sm))

    @jax.jit
    def health(st, out):
        act = jnp.arange(KF) < st.graph.n
        return (jnp.isnan(out.pose.t).any(),
                jnp.isnan(jnp.where(act[:, None], st.graph.t, 0.0)).any(),
                jnp.isnan(jnp.where(act[:, None, None], st.graph.R, 0.0)).any(),
                jnp.isnan(st.pose.t).any(), out.loop_detected, out.opt_pending,
                out.is_keyframe, out.pose.t)

    ang0 = KF_ANG * PRE
    for k in range(n_frames):
        t = circle(ang0 + 0.04 * k)
        c, cm, s, sm = scan_at(t, seed=k)
        state, out = step1(state, soa(c), jnp.asarray(cm), soa(s), jnp.asarray(sm))
        hp, hg, hr, hs, ld, pend, iskf, pt = jax.device_get(health(state, out))
        print(f"frame {k:2d} kf={bool(iskf)} loop={bool(ld)} pend={int(pend)} "
              f"nan_pose={bool(hp)} nan_graph_t={bool(hg)} nan_graph_R={bool(hr)} "
              f"nan_state_pose={bool(hs)} err={np.linalg.norm(pt - t):.4f}", flush=True)
        if hp or hg or hr:
            print("FIRST NAN at frame", k)
            break


if __name__ == "__main__":
    main()
