#!/usr/bin/env python
"""Headline benchmark + the full BASELINE.json config suite on one chip.

Headline (config 1): scan-to-map point-to-plane ICP frames/sec, 20k-pt
frames, 30 GN iterations — target 100 Hz/chip (vs_baseline = fps / 100).

Secondary (configs 2-5 = BASELINE configs; 6 = extra, reported in
detail.secondary):
  2. NDT scan-to-map over a Livox-like frame sequence      [fps]
  3. Full LIO loop (iESKF + undistort + map insert)        [fps]
  4. Occupancy-grid mapping + pcd2map pipeline             [scans/sec]
  5. Pose-graph backend solve, 5k keyframes + 256 loops    [ms/solve]
  6. Full LIO-SAM slam_step (scan2map + loops + window)    [fps]

Throughput-mode measurement: frames are chained inside ONE jitted program
(lax.map / lax.scan), one device->host readback at the end — the production
streaming shape (the axon tunnel costs a fixed ~40 ms per program+readback
round trip; chaining amortizes it exactly like a real odometry loop reading
poses back in batches). Every frame still runs its full workload.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "detail"}.
Use --only N to run a single config while developing.
"""

import argparse
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
F_CHAIN = 24   # frames per batched program (config 1); 16 for config 2
F_SERIAL = 8   # frames in the serial reference chain
# baked stencil: one gather row per query instead of 7 (see GridConfig.baked).
# Round-3 sweep (tools + /tmp/icp_ab.py): SMALLER voxels with FEWER candidate
# rows dominate the old 0.5 m / 28-candidate layout on BOTH axes — res 0.3 m
# keeps the 7-voxel stencil's candidates tight around the query so 10 rows
# beat 28 blurrier ones: 118.5 -> 232.8 fps and max err 0.0071 -> 0.0022 m.
# (The stencil reach shrinks to ~0.3 m; the declared workload — 0.3 m initial
# offsets, 3-search cadence — converges with margin, gated by trans_err below.)
GRID = ops.GridConfig(capacity=1 << 17, pts_per_voxel=10, resolution=0.3, probe=4, nearby=7, baked=True)
ICP = register.ICPConfig(
    search_every=10, warmup_searches=0,
    solver=register.SolverConfig(max_iterations=N_ITERS, rotation_epsilon=0.0, translation_epsilon=0.0),
)  # epsilon 0: run all 30 iterations — honest full-workload timing; fixed
# 3-search cadence (trans_err gate proves accuracy is unaffected)


def _frames(world, n, n_pts, seed0=100, rot=0.05, trans=0.3):
    rng = np.random.default_rng(1)
    srcs, gts = [], []
    for f in range(n):
        R, t = synthetic.random_pose(seed=seed0 + f, rot_scale=rot, trans_scale=trans)
        sel = rng.choice(len(world), size=n_pts, replace=False)
        srcs.append(((world[sel] - t) @ R).astype(np.float32).T)
        gts.append(t)
    return jnp.asarray(np.stack(srcs)), np.stack(gts)


def config1_icp():
    world = synthetic.make_room_cloud(60_000, seed=0)
    srcs, gt_t = _frames(world, F_CHAIN, N_POINTS)
    grid_cfg, grid = register.build_target_map(jnp.asarray(world.T), grid_cfg=GRID)

    # --- throughput: B frames solved as ONE batched program (the production
    # serving shape). Every frame still runs all 30 GN iterations and its
    # full correspondence searches; the batch only amortizes per-op dispatch
    # overhead — the per-frame FLOP/gather workload is identical to the
    # serial path (register.batched_point_to_plane_icp docstring).
    @jax.jit
    def solve_batched(grid, srcs):
        pose, done, iters = register.batched_point_to_plane_icp(grid_cfg, grid, srcs, cfg=ICP)
        return pose.t

    ts = solve_batched(grid, srcs)
    terr_b = float(np.max(np.linalg.norm(np.asarray(ts) - gt_t, axis=1)))
    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        _ = np.asarray(solve_batched(grid, srcs))
    dt = (time.perf_counter() - t0) / (reps * F_CHAIN)

    # --- serial chain (lax.map, baked map): the strictly-sequential shape
    srcs_s = srcs[:F_SERIAL]

    @jax.jit
    def solve_chain(grid, srcs):
        res = jax.lax.map(lambda s: register.point_to_plane_icp(grid_cfg, grid, s, cfg=ICP), srcs)
        return res.pose.t

    ts = solve_chain(grid, srcs_s)
    terr = float(np.max(np.linalg.norm(np.asarray(ts) - gt_t[:F_SERIAL], axis=1)))
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        _ = np.asarray(solve_chain(grid, srcs_s))
    dt_serial = (time.perf_counter() - t0) / (reps * F_SERIAL)

    # single-frame latency on the baked map — one program + one readback per
    # frame, so the axon tunnel's fixed ~40 ms round trip is included; the
    # device-compute share is serial_per_frame_ms. (The round-2 "baked
    # single-frame XLA fault" is a kNN/plane-fit fusion miscompile, mitigated
    # by an optimization_barrier in icp.correspondences — repro matrix in
    # tools/repro_baked_single.py; trans_err_max_m below gates accuracy.)
    solve1 = jax.jit(lambda g, s: register.point_to_plane_icp(grid_cfg, g, s, cfg=ICP).pose.t)
    _ = np.asarray(solve1(grid, srcs[0]))
    t0 = time.perf_counter()
    for f in range(4):
        _ = np.asarray(solve1(grid, srcs[f % F_CHAIN]))
    lat_ms = (time.perf_counter() - t0) / 4 * 1e3
    # tunnel floor: an (almost) empty program + readback — what the axon relay
    # charges ANY single-program dispatch. single_frame_device_ms_est is the
    # on-device share (what a locally-attached chip would see).
    noop = jax.jit(lambda s: s[:, 0] + 1.0)
    _ = np.asarray(noop(srcs[0]))
    t0 = time.perf_counter()
    for f in range(4):
        _ = np.asarray(noop(srcs[f % F_CHAIN]))
    floor_ms = (time.perf_counter() - t0) / 4 * 1e3
    return 1.0 / dt, {"per_frame_ms": round(dt * 1e3, 3),
                      "serial_per_frame_ms": round(dt_serial * 1e3, 3),
                      "single_frame_latency_ms": round(lat_ms, 3),
                      "tunnel_floor_ms": round(floor_ms, 3),
                      "single_frame_device_ms_est": round(max(lat_ms - floor_ms, 0.0), 3),
                      "batch": F_CHAIN, "trans_err_max_m": round(max(terr, terr_b), 5)}


def config2_ndt():
    """NDT scan-to-map matching, chained frame sequence (BASELINE config 2)."""
    world = synthetic.make_room_cloud(60_000, seed=2)
    n_pts = 10_000
    srcs, gt_t = _frames(world, 16, n_pts, seed0=300, rot=0.03, trans=0.2)
    ncfg = register.NDTConfig(resolution=1.0, solver=register.SolverConfig(max_iterations=20))
    # stencil-baked target (gg.bake): one probe + one wide gather per query
    # instead of DIRECT7's seven — results identical (equivalence-tested)
    ndt_grid, ndt_map = register.ndt.build_target(ncfg, jnp.asarray(world.T), capacity=1 << 15, baked=True)

    @jax.jit
    def solve_chain(srcs):
        res = jax.lax.map(lambda s: register.ndt.align(ndt_grid, ndt_map, s, cfg=ncfg), srcs)
        return res.pose.t

    ts = solve_chain(srcs)
    terr = float(np.max(np.linalg.norm(np.asarray(ts) - gt_t, axis=1)))
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        _ = np.asarray(solve_chain(srcs))
    dt = (time.perf_counter() - t0) / (reps * 16)
    return {"ndt_scan_to_map_fps_10k": round(1.0 / dt, 2), "ndt_trans_err_max_m": round(terr, 4)}


def config3_lio(n_frames=200):
    """Full SEQUENTIAL LIO loop (BASELINE config 3): per-frame IMU propagation
    + undistortion + iterated ESKF + incremental map insert, frames chained in
    blocks with one readback per block (the streaming odometry shape).
    Reports throughput AND trajectory error vs the exact-IMU ground truth."""
    from pointcloud_slam_tpu.io import feed
    from pointcloud_slam_tpu.models import lio

    # round-3 tuned odometry shape (tools/profile_lio.py / probe_lio_parts.py):
    # capacity 1<<16 (occupancy ~15k voxels -> load 0.23; halves the per-frame
    # knn-table rebuild), one search per update (research_on_converge=False —
    # correspondences cached across the iterated update's 3 iterations),
    # survivor/insert budgets sized to the measured steady state. ATE vs the
    # exact-IMU ground truth is reported below and gates these choices.
    cfg = lio.LIOConfig(
        grid=ops.GridConfig(capacity=1 << 16, pts_per_voxel=3, resolution=0.4, nearby=7, probe=4, claim_rounds=2),
        scan_leaf=0.3, map_leaf=0.3, init_imu_frames=1,
        scan_budget=6144, insert_budget=2048,
        max_iterations=3, research_on_converge=False,
    )
    BLOCK = 40
    n_pts, n_imu = 20_000, 20
    world = synthetic.make_room_cloud(80_000, seed=3, size=30.0)
    traj = synthetic.make_imu_trajectory(n_frames + 1, imu_per_frame=n_imu, frame_dt=0.1, seed=3)

    rng = np.random.default_rng(3)
    frames, gt_pos = [], []
    for f in range(n_frames):
        i0, i1 = f * n_imu, (f + 1) * n_imu
        pos, R = traj["pos"][i1], traj["R"][i1]
        rel = (world - pos) @ R  # world -> body at scan end
        r = np.linalg.norm(rel, axis=1)
        vis = rel[(r < 30.0) & (r > 0.3)]
        pts = vis[rng.choice(len(vis), size=min(n_pts, len(vis)), replace=False)].astype(np.float32)
        imu_t = (traj["t"][i0 + 1 : i1 + 1] - traj["t"][i0]).astype(np.float32)
        frames.append(feed.make_frame(
            pts, np.full(len(pts), 0.1, np.float32), traj["acc"][i0:i1], traj["gyro"][i0:i1],
            imu_t, n_points=n_pts, n_imu=n_imu, prev_imu_t=0.0,
        ))
        gt_pos.append(pos)
    stacked = [jax.tree.map(lambda *xs: jnp.stack(xs), *frames[i : i + BLOCK]) for i in range(0, n_frames, BLOCK)]

    @jax.jit
    def run_block(state, fr_block):
        def body(s, fr):
            s, out = lio.lio_step(cfg, s, fr)
            return s, out.pos

        return jax.lax.scan(body, state, fr_block)

    state = lio.create_state(cfg)
    # warmup/compile + init frames; a REAL readback, not block_until_ready —
    # the axon relay is lazy and block_until_ready does not force execution
    state, ps = run_block(state, stacked[0])
    est = [np.asarray(ps)]
    t0 = time.perf_counter()
    done = 0
    for blk in stacked[1:]:
        state, ps = run_block(state, blk)
        est.append(np.asarray(ps))
        done += BLOCK
    dt = (time.perf_counter() - t0) / max(done, 1)
    est = np.concatenate(est)                      # (n_frames, 3)
    errs = np.linalg.norm(est[5:] - np.asarray(gt_pos)[5:], axis=1)
    return {"lio_fps_20k": round(1.0 / dt, 2), "lio_frames_measured": done,
            "lio_ate_mean_m": round(float(errs.mean()), 3),
            "lio_ate_final_m": round(float(errs[-1]), 3)}


def config4_occupancy():
    """Occupancy mapping + pcd2map nav-cloud pipeline (BASELINE config 4)."""
    from pointcloud_slam_tpu.maps import occupancy as occ
    from pointcloud_slam_tpu.maps import pcd2map

    cfg = occ.OccupancyConfig(size=1024, resolution=0.1, max_range=20.0, min_z=-0.5, max_z=2.0)
    world = synthetic.make_room_cloud(60_000, seed=4)
    grid = occ.create(cfg)
    n_scans = 64
    clouds = []
    for k in range(n_scans):
        pose = np.asarray([0.1 * k, 0.05 * k], np.float32)
        clouds.append((jnp.asarray(world[(k * 900) % 40_000 :][:8192].T), pose))

    @jax.jit
    def insert_all(grid, pts_stack, poses):
        def body(g, inp):
            p, xy = inp
            return occ.insert_cloud(cfg, g, p, jnp.ones(p.shape[1], bool), xy, 0.0), 0

        g, _ = jax.lax.scan(body, grid, (pts_stack, poses))
        return g

    pts_stack = jnp.stack([c[0] for c in clouds])
    poses = jnp.stack([jnp.asarray(c[1]) for c in clouds])
    g = insert_all(grid, pts_stack, poses)
    _ = np.asarray(g.logodds[0, 0])  # real readback (axon relay is lazy)
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        g = insert_all(grid, pts_stack, poses)
        _ = np.asarray(g.logodds[0, 0])
    dt = (time.perf_counter() - t0) / (reps * n_scans)

    # pcd2map: downsample + z-band nav cloud of the full building scan
    # (jit + warmup first — compile time is not pipeline time)
    nav_fn = jax.jit(lambda p, m: pcd2map.pcd_to_nav_cloud(p, m, leaf=0.2, z_min=0.1, z_max=1.5))
    wp, wm = jnp.asarray(world.T), jnp.ones(len(world), bool)
    _ = np.asarray(nav_fn(wp, wm)[1].sum())
    t0 = time.perf_counter()
    for _ in range(3):
        nav, nmask = nav_fn(wp, wm)
        _ = np.asarray(nmask.sum())
    pcd2map_ms = (time.perf_counter() - t0) / 3 * 1e3
    return {"occupancy_scans_per_sec": round(1.0 / dt, 2), "pcd2map_ms_60k": round(pcd2map_ms, 1)}


def config5_backend():
    """Pose-graph solve at 5k keyframes + 256 loops (BASELINE config 5)."""
    from pointcloud_slam_tpu.models.liosam import backend as bk

    KF, L = 5120, 256
    # chain-preconditioned PCG: iterations scale with the number of loops,
    # not the trajectory length; 8x48 sits on the chi2 plateau (see the
    # residual_stats sweep in ROUND_NOTES) while staying well under the 1 s
    # full-solve budget
    cfg = bk.BackendConfig(max_keyframes=KF, max_loops=L, gn_iterations=8, pcg_iterations=48)
    rng = np.random.default_rng(0)
    # circular trajectory with drift; loops close ring-distance neighbors
    ang = np.linspace(0, 4 * np.pi, KF)
    t_true = np.stack([50 * np.cos(ang), 50 * np.sin(ang), 0.02 * np.arange(KF)], 1).astype(np.float32)
    g = bk.create(cfg)
    eye = np.broadcast_to(np.eye(3, dtype=np.float32), (KF, 3, 3))
    drift = np.cumsum(rng.normal(0, 0.01, (KF, 3)).astype(np.float32), axis=0)
    t_est = t_true + drift
    odom_t = np.concatenate([np.zeros((1, 3), np.float32), np.diff(t_true, axis=0)], 0)
    half = KF // 2
    li = rng.integers(0, half - 1, L).astype(np.int32)
    lj = (li + half).astype(np.int32)
    lt = (t_true[lj] - t_true[li]).astype(np.float32)
    g = g._replace(
        R=jnp.asarray(eye), t=jnp.asarray(t_est), n=jnp.asarray(KF, jnp.int32),
        odom_R=jnp.asarray(eye), odom_t=jnp.asarray(odom_t),
        odom_info=jnp.full((KF, 6), 1e2, jnp.float32),
        loop_i=jnp.asarray(li), loop_j=jnp.asarray(lj),
        loop_R=jnp.broadcast_to(jnp.eye(3), (L, 3, 3)).astype(jnp.float32),
        loop_t=jnp.asarray(lt), loop_info=jnp.full((L, 6), 1e3, jnp.float32),
        loop_robust=jnp.ones((L,), bool), n_loops=jnp.asarray(L, jnp.int32),
    )
    solved = bk.optimize(cfg, g)
    err0 = float(np.linalg.norm(np.asarray(g.t) - t_true, axis=1).max())
    err1 = float(np.linalg.norm(np.asarray(solved.t) - t_true, axis=1).max())
    chi0 = float(np.asarray(bk.residual_stats(cfg, g)[0]))
    chi1 = float(np.asarray(bk.residual_stats(cfg, solved)[0]))
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        solved = bk.optimize(cfg, g)
        _ = np.asarray(solved.t[0])
    dt = (time.perf_counter() - t0) / reps
    # the per-keyframe incremental update (iSAM2 update role) at 5k nodes
    win = jax.jit(lambda g: bk.optimize_window(cfg, g, window=32))
    _ = np.asarray(win(g).t[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        _ = np.asarray(win(g).t[0])
    dt_win = (time.perf_counter() - t0) / reps
    return {"backend_5k_solve_ms": round(dt * 1e3, 1), "backend_err_before_m": round(err0, 3),
            "backend_err_after_m": round(err1, 3),
            "backend_chi2_before": round(chi0, 1), "backend_chi2_after": round(chi1, 4),
            "backend_window_update_ms": round(dt_win * 1e3, 1)}


def config6_slam():
    """Full LIO-SAM slam_step throughput (scan2map + keyframe gating + SC/RS
    loop machinery + incremental window solve) at product shapes, with the
    round-3 baked corner/surf local maps. Not a BASELINE config — reported as
    extra product-shape evidence (the reference's mapOptmization runs at
    lidar rate ~10 Hz, mapOptmization.cpp:356-405)."""
    from pointcloud_slam_tpu.models.liosam import backend as bk
    from pointcloud_slam_tpu.models.liosam import scan2map as s2m
    from pointcloud_slam_tpu.models.liosam import slam

    n_corner, n_surf, n_frames = 512, 2048, 32
    corners_w, surfs_w = synthetic.make_feature_world()
    cfg = slam.SLAMConfig(
        backend=bk.BackendConfig(max_keyframes=128, max_loops=16,
                                 keyframe_dist_thresh=0.3, gn_iterations=3, pcg_iterations=24),
        n_corner=n_corner, n_surf=n_surf,
        scan2map=s2m.Scan2MapConfig(
            corner_grid=s2m.baked_grid(s2m.Scan2MapConfig().corner_grid),
            surf_grid=s2m.baked_grid(s2m.Scan2MapConfig().surf_grid),
        ),
    )

    def soa(x):
        return jnp.asarray(np.ascontiguousarray(np.asarray(x).T))

    cs, cms, ss, sms, gts = [], [], [], [], []
    for k in range(n_frames):
        ang = 0.04 * k
        t = np.array([6.0 * np.cos(ang) - 6.0, 6.0 * np.sin(ang), 1.0], np.float32)
        R = np.eye(3, dtype=np.float32)
        c, cm = synthetic.take_scan(corners_w, R, t, n_corner, seed=k)
        s, sm = synthetic.take_scan(surfs_w, R, t, n_surf, seed=1000 + k)
        cs.append(soa(c)); cms.append(jnp.asarray(cm)); ss.append(soa(s)); sms.append(jnp.asarray(sm))
        gts.append(t)
    cs, cms, ss, sms = jnp.stack(cs), jnp.stack(cms), jnp.stack(ss), jnp.stack(sms)

    @jax.jit
    def run_all(state):
        def body(st, inp):
            c, cm, s, sm = inp
            st, out = slam.slam_step(cfg, st, c, cm, s, sm)
            return st, out.pose.t
        return jax.lax.scan(body, state, (cs, cms, ss, sms))

    state = slam.create_state(cfg)
    _, ts = run_all(state)
    err = float(np.linalg.norm(np.asarray(ts)[-1] - (gts[-1] - gts[0])))
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        _, ts = run_all(state)
        _ = np.asarray(ts)
    dt = (time.perf_counter() - t0) / (reps * n_frames)
    return {"slam_step_fps": round(1.0 / dt, 2), "slam_final_err_m": round(err, 4)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", type=int, default=0, help="run a single config (1-6)")
    ap.add_argument("--skip_secondary", action="store_true")
    ap.add_argument("--platform", default="", help="force the JAX backend (dev only; "
                    "the recorded numbers are TPU)")
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    if args.only:
        fns = {1: config1_icp, 2: config2_ndt, 3: config3_lio, 4: config4_occupancy, 5: config5_backend, 6: config6_slam}
        out = fns[args.only]()
        print(json.dumps(out if isinstance(out, dict) else {"fps": out[0], **out[1]}))
        return

    fps, det1 = config1_icp()
    secondary = {}
    if not args.skip_secondary:
        for fn in (config2_ndt, config3_lio, config4_occupancy, config5_backend, config6_slam):
            try:
                secondary.update(fn())
            except Exception as e:  # a secondary config must never kill the headline
                secondary[fn.__name__ + "_error"] = f"{type(e).__name__}: {e}"[:200]

    out = {
        "metric": "scan_to_map_icp_fps_20k_30iter",
        "value": round(fps, 2),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / 100.0, 3),
        "detail": {**det1, "device": str(jax.devices()[0]), "secondary": secondary},
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
