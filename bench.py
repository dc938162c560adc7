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
import dataclasses
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
    # reference-semantics parity config (laser_mapping.cc:618 + the library
    # default esekfom re-search on convergence): 4 iterations, re-search when
    # converged — the fps cost of exact reference semantics is recorded next
    # to the tuned number (VERDICT r3 weak #4)
    cfg_parity = dataclasses.replace(cfg, max_iterations=4, research_on_converge=True)
    BLOCK = 40
    n_imu = 20
    world = synthetic.make_room_cloud(80_000, seed=3, size=30.0)
    traj = synthetic.make_imu_trajectory(n_frames + 1, imu_per_frame=n_imu, frame_dt=0.1, seed=3)

    def build_frames(n_pts, nf):
        rng = np.random.default_rng(3)
        frames, gt_pos = [], []
        for f in range(nf):
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
        stacked = [jax.tree.map(lambda *xs: jnp.stack(xs), *frames[i : i + BLOCK])
                   for i in range(0, nf, BLOCK)]
        return stacked, gt_pos

    stacked, gt_pos = build_frames(20_000, n_frames)

    def run_cfg(c, blocks):
        @jax.jit
        def run_block(state, fr_block):
            def body(s, fr):
                s, out = lio.lio_step(c, s, fr)
                return s, out.pos

            return jax.lax.scan(body, state, fr_block)

        state = lio.create_state(c)
        # warmup/compile + init frames; a REAL readback, not block_until_ready —
        # the axon relay is lazy and block_until_ready does not force execution
        state, ps = run_block(state, blocks[0])
        est = [np.asarray(ps)]
        t0 = time.perf_counter()
        done = 0
        for blk in blocks[1:]:
            state, ps = run_block(state, blk)
            est.append(np.asarray(ps))
            done += BLOCK
        dt = (time.perf_counter() - t0) / max(done, 1)
        return np.concatenate(est), done, dt

    est, done, dt = run_cfg(cfg, stacked)
    errs = np.linalg.norm(est[5:] - np.asarray(gt_pos)[5:], axis=1)
    # parity semantics on a shorter slice of the same sequence
    est_p, done_p, dt_p = run_cfg(cfg_parity, stacked[:3])
    errs_p = np.linalg.norm(est_p[5:] - np.asarray(gt_pos)[5 : len(est_p)], axis=1)
    # ---- frame-size envelope (VERDICT r4 next #7): the reference's
    # 198-1820 fps spread is mostly frame-size driven (plot_time_usage.py:8);
    # same tuned config, same trajectory, smaller scans ----
    envelope = {}
    for n_e in (10_000, 5_000):
        stacked_e, gt_e = build_frames(n_e, 120)
        est_e, done_e, dt_e = run_cfg(cfg, stacked_e)
        errs_e = np.linalg.norm(est_e[5:] - np.asarray(gt_e)[5:], axis=1)
        envelope[f"lio_fps_{n_e // 1000}k"] = round(1.0 / dt_e, 2)
        envelope[f"lio_ate_mean_m_{n_e // 1000}k"] = round(float(errs_e.mean()), 3)
    return {"lio_fps_20k": round(1.0 / dt, 2), "lio_frames_measured": done,
            **envelope,
            "lio_ate_mean_m": round(float(errs.mean()), 3),
            "lio_ate_final_m": round(float(errs[-1]), 3),
            "lio_fps_20k_parity": round(1.0 / dt_p, 2),
            "lio_ate_mean_m_parity": round(float(errs_p.mean()), 3),
            "lio_parity_frames": done_p}


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


def build_backend_graph(KF=5120, L=256, gn_iterations=8, pcg_iterations=48,
                        loop_noise=0.0):
    """The config-5 product-shape graph: drifted double-ring trajectory, odom
    factors on every pair, ring-crossing loops, IMU factor family on every
    pair. Returns (cfg, g_odom_loop, g_imu, t_true). Shared by config5 and
    tools/probe_backend_sweep.py. `loop_noise` perturbs the loop measurements
    so the graph's optimum has genuinely nonzero chi2 (needed for a
    meaningful chi2 ratio vs the f64 oracle — a noise-free graph's oracle
    optimum is ~1e-12 and any f32 floor inflates the ratio arbitrarily)."""
    from pointcloud_slam_tpu.geom import so3 as so3_mod
    from pointcloud_slam_tpu.models.lio import preintegration as pre
    from pointcloud_slam_tpu.models.liosam import backend as bk

    T = 0.5  # keyframe gap [s] (~1 m spacing at 2 m/s; 200 Hz IMU => 100 samples/pim)
    # chain-preconditioned PCG: iterations scale with the number of loops,
    # not the trajectory length; 8x48 sits on the chi2 plateau (see the
    # residual_stats sweep in ROUND_NOTES) while staying well under the 1 s
    # full-solve budget
    cfg = bk.BackendConfig(max_keyframes=KF, max_loops=L,
                           gn_iterations=gn_iterations, pcg_iterations=pcg_iterations)
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
    if loop_noise:
        lt = lt + rng.normal(0, loop_noise, lt.shape).astype(np.float32)
    g = g._replace(
        R=jnp.asarray(eye), t=jnp.asarray(t_est), n=jnp.asarray(KF, jnp.int32),
        odom_R=jnp.asarray(eye), odom_t=jnp.asarray(odom_t),
        odom_info=jnp.full((KF, 6), 1e2, jnp.float32),
        loop_i=jnp.asarray(li), loop_j=jnp.asarray(lj),
        loop_R=jnp.broadcast_to(jnp.eye(3), (L, 3, 3)).astype(jnp.float32),
        loop_t=jnp.asarray(lt), loop_info=jnp.full((L, 6), 1e3, jnp.float32),
        loop_robust=jnp.ones((L,), bool), n_loops=jnp.asarray(L, jnp.int32),
    )

    # ---- IMU factor family on every pair (i-1, i): preintegrated deltas
    # consistent with the ground-truth trajectory (closed-form — what an
    # error-free 200 Hz stream integrates to over the gap; the pim CONTENT
    # does not change solve cost, only the factor family being linearized),
    # constant-signal bias Jacobians at the standard magnitudes ----
    grav = np.array([0.0, 0.0, -9.81], np.float32)
    v_true = np.empty_like(t_true)
    v_true[:-1] = np.diff(t_true, axis=0) / T
    v_true[-1] = v_true[-2]
    dv = np.zeros_like(t_true)
    dp = np.zeros_like(t_true)
    dv[1:] = v_true[1:] - v_true[:-1] - grav * T            # R_{i-1}=I
    dp[1:] = (t_true[1:] - t_true[:-1]) - v_true[:-1] * T - 0.5 * grav * T * T
    a_body = dv / T + grav                                   # body accel estimate
    hat_a = jax.vmap(so3_mod.hat)(jnp.asarray(a_body))
    eyeKF = jnp.asarray(eye)
    z3 = jnp.zeros((KF, 3), jnp.float32)
    pims = pre.PreintegratedImu(
        dR=eyeKF, dv=jnp.asarray(dv), dp=jnp.asarray(dp),
        dt=jnp.full((KF,), T, jnp.float32),
        dR_dbg=-T * eyeKF, dv_dbg=-0.5 * T * T * hat_a, dv_dba=-T * eyeKF,
        dp_dbg=-(T ** 3 / 6.0) * hat_a, dp_dba=-0.5 * T * T * eyeKF,
        bg0=z3, ba0=z3,
    )
    imu_info = np.zeros((KF, 9), np.float32)
    imu_info[1:] = np.concatenate([np.full(3, 1e6), np.full(3, 1e4), np.full(3, 1e4)]).astype(np.float32)
    bias_info = np.zeros((KF, 6), np.float32)
    bias_info[1:] = cfg.bias_walk_info
    imu_mask = np.zeros(KF, bool)
    imu_mask[1:] = True
    g_imu = g._replace(
        vel=jnp.asarray(v_true + rng.normal(0, 0.02, (KF, 3)).astype(np.float32)),
        imu_pim=pims, imu_info=jnp.asarray(imu_info),
        bias_info=jnp.asarray(bias_info), imu_mask=jnp.asarray(imu_mask),
    )
    return cfg, g, g_imu, t_true


def config5_backend():
    """Pose-graph solve at 5k keyframes + 256 loops (BASELINE config 5),
    WITH the IMU factor family populated on every consecutive pair — the
    product shape (the reference backend always carries ImuFactors,
    imuPreintegration.cpp:243-438). The vmapped-jacfwd IMU linearization is
    the most expensive factor family (backend.py:309-326).
    Per-rep times are reported to pin run-to-run variance."""
    from pointcloud_slam_tpu.models.liosam import backend as bk

    KF, L = 5120, 256
    cfg, g, g_imu, t_true = build_backend_graph(KF, L)

    def timed_solve(graph, reps=5):
        solved = bk.optimize(cfg, graph)
        _ = np.asarray(solved.t[0])  # warmup/compile
        per_rep = []
        for _ in range(reps):
            t0 = time.perf_counter()
            solved = bk.optimize(cfg, graph)
            _ = np.asarray(solved.t[0])
            per_rep.append((time.perf_counter() - t0) * 1e3)
        return solved, per_rep

    solved, per_rep = timed_solve(g_imu)
    # ONE GN sweep at 5k nodes = the max per-frame stall of the deferred
    # loop-event solve (slam.py solve_and_correct runs exactly one per frame)
    sweep1 = bk.optimize(cfg, g_imu, gn_iterations=1)
    _ = np.asarray(sweep1.t[0])
    t0 = time.perf_counter()
    for _ in range(5):
        sweep1 = bk.optimize(cfg, g_imu, gn_iterations=1)
        _ = np.asarray(sweep1.t[0])
    sweep1_ms = (time.perf_counter() - t0) / 5 * 1e3
    # the SLICED drain sweep (slam.py loop_solve_pcg_slice=16 default):
    # the actual per-frame stall while a loop event drains at 5k keyframes
    slice1 = bk.optimize(cfg, g_imu, gn_iterations=1, pcg_iterations=16)
    _ = np.asarray(slice1.t[0])
    t0 = time.perf_counter()
    for _ in range(5):
        slice1 = bk.optimize(cfg, g_imu, gn_iterations=1, pcg_iterations=16)
        _ = np.asarray(slice1.t[0])
    slice1_ms = (time.perf_counter() - t0) / 5 * 1e3
    err0 = float(np.linalg.norm(np.asarray(g_imu.t) - t_true, axis=1).max())
    err1 = float(np.linalg.norm(np.asarray(solved.t) - t_true, axis=1).max())
    chi0 = float(np.asarray(bk.residual_stats(cfg, g_imu)[0]))
    chi1 = float(np.asarray(bk.residual_stats(cfg, solved)[0]))
    _, per_rep_odom = timed_solve(g)  # odom+loop only (round<=3 comparison shape)

    # ---- independent f64 oracle on a 1k-node pose-only slice (VERDICT r4
    # weak #2): exact scipy-sparse GN with FD Jacobians vs the f32 chain-PCG
    # solve of the SAME graph — the chi2 ratio distinguishes "PCG converged"
    # from "PCG underconverged at 8x48" ----
    from pointcloud_slam_tpu.models.liosam import oracle_backend as ob

    n1, L1 = 1024, 64
    cfg1, g1, _g1_imu, _tt1 = build_backend_graph(
        n1, L1, gn_iterations=cfg.gn_iterations, pcg_iterations=cfg.pcg_iterations,
        loop_noise=0.05)
    d_o = ob.extract_pose_slice(g1)
    R_o, t_o, _hist = ob.solve(d_o, iters=15)
    s1 = bk.optimize(cfg1, g1)
    R_p = np.asarray(s1.R[:n1], np.float64)
    t_p = np.asarray(s1.t[:n1], np.float64)
    chi_oracle = ob.chi2(d_o, R_o, t_o)
    chi_pcg = ob.chi2(d_o, R_p, t_p)
    oracle_ratio = chi_pcg / max(chi_oracle, 1e-12)
    oracle_pose_diff = float(np.abs(t_p - t_o).max())
    # the per-keyframe incremental update (iSAM2 update role) at 5k nodes,
    # also with the IMU family in-window
    win = jax.jit(lambda g: bk.optimize_window(cfg, g, window=32))
    _ = np.asarray(win(g_imu).t[0])
    win_rep = []
    for _ in range(5):
        t0 = time.perf_counter()
        _ = np.asarray(win(g_imu).t[0])
        win_rep.append((time.perf_counter() - t0) * 1e3)
    mean = lambda xs: sum(xs) / len(xs)
    return {"backend_5k_solve_ms": round(mean(per_rep), 1),
            "backend_5k_solve_ms_per_rep": [round(x, 1) for x in per_rep],
            "backend_5k_single_sweep_ms": round(sweep1_ms, 1),
            "backend_5k_sweep_slice_ms": round(slice1_ms, 1),
            "backend_5k_solve_odom_only_ms": round(mean(per_rep_odom), 1),
            "backend_err_before_m": round(err0, 3),
            "backend_err_after_m": round(err1, 3),
            "backend_chi2_before": round(chi0, 1), "backend_chi2_after": round(chi1, 4),
            "backend_chi2_vs_oracle_ratio": round(float(oracle_ratio), 4),
            "backend_chi2_oracle_1k": round(float(chi_oracle), 4),
            "backend_pose_diff_vs_oracle_m": round(oracle_pose_diff, 4),
            "backend_window_update_ms": round(mean(win_rep), 1),
            "backend_window_update_ms_per_rep": [round(x, 1) for x in win_rep]}


def config7_pairwise():
    """Single-pair registration table — the published fast_gicp/ndt_omp
    benchmark workload (fast_gicp/README.md:96-123: 17k-pt KITTI pair on a
    Core i9-9900K + RTX 2080 Ti; ndt_omp/README.md:6-44 on a Core i7-6700K).
    VERDICT r4 missing #2: the one reference perf claim with no recorded
    counterpart. Reported per algorithm:
      chain_ms        — per-align ms amortized over an 8-align serial chain in
                        ONE program (comparable to the table's 100times_reuse
                        / 100: target structures reused, device time only),
      single_ms_est   — one-align latency minus the measured axon tunnel
                        floor (what a locally-attached chip would see),
      fitness / terr  — cross-algorithm correctness (align.cpp role).
    VGICP/GICP chains INCLUDE per-source covariance estimation (the
    reference's setInputSource does too)."""
    from pointcloud_slam_tpu import ops, register

    n, M = 17_000, 8
    world = synthetic.make_room_cloud(40_000, seed=0)
    rng = np.random.default_rng(0)
    tgt = world[rng.choice(len(world), n, replace=False)]
    srcs_np, gts = [], []
    for m in range(M):
        R, t = synthetic.random_pose(seed=10 + m, rot_scale=0.05, trans_scale=0.3)
        srcs_np.append(((world[rng.choice(len(world), n, replace=False)] - t) @ R).T)
        gts.append(t)
    srcs = jnp.asarray(np.stack(srcs_np).astype(np.float32))  # (M, 3, n)
    gts = np.stack(gts)
    tgt_j = jnp.asarray(np.ascontiguousarray(tgt.T.astype(np.float32)))
    mask = jnp.ones(n, bool)

    fit_grid = ops.GridConfig(capacity=1 << 16, pts_per_voxel=8, resolution=0.5, nearby=7)
    _, fit_map = register.build_target_map(tgt_j, grid_cfg=fit_grid)

    def fitness(pose_t, pose_R):
        from pointcloud_slam_tpu.geom import se3
        pw = se3.Pose(jnp.asarray(pose_R), jnp.asarray(pose_t)).apply(srcs[-1])
        f, _ = register.fitness_score(fit_grid, fit_map, pw, mask, max_range=1.0)
        return float(f)

    # tunnel floor (same methodology as config1)
    noop = jax.jit(lambda s: s[:, 0] + 1.0)
    _ = np.asarray(noop(srcs[0]))
    t0 = time.perf_counter()
    for f in range(4):
        _ = np.asarray(noop(srcs[f % M]))
    floor_ms = (time.perf_counter() - t0) / 4 * 1e3

    table = {}

    def run(name, solve_one, reps=3):
        """solve_one: (3, n) src -> Pose."""
        chain = jax.jit(lambda ss: jax.lax.map(lambda s: solve_one(s), ss))
        res = chain(srcs)
        ts = np.asarray(res.t)
        t0 = time.perf_counter()
        for _ in range(reps):
            ts = np.asarray(chain(srcs).t)
        chain_ms = (time.perf_counter() - t0) / (reps * M) * 1e3
        one = jax.jit(lambda s: solve_one(s))
        r1 = one(srcs[-1])
        _ = np.asarray(r1.t)
        t0 = time.perf_counter()
        for f in range(4):
            r1 = one(srcs[(f + 1) % M])
            _ = np.asarray(r1.t)
        single_ms = (time.perf_counter() - t0) / 4 * 1e3
        terr = float(np.max(np.linalg.norm(ts - gts, axis=1)))
        table[name] = {
            "chain_ms": round(chain_ms, 2),
            "single_ms_est": round(max(single_ms - floor_ms, 0.0), 2),
            "fitness": round(fitness(np.asarray(res.t)[-1], np.asarray(res.R)[-1]), 4),
            "terr_max_m": round(terr, 4),
        }

    icp_cfg = register.ICPConfig(solver=register.SolverConfig(max_iterations=30))
    run("icp_p2pl", lambda s: register.point_to_plane_icp(fit_grid, fit_map, s, cfg=icp_cfg).pose)

    # stencil-baked targets: the serving-path layout (ONE probe + ONE wide
    # gather per query instead of `nearby` probe+gathers; identical results)
    ncfg = register.NDTConfig(resolution=1.0)
    ng, nmap = register.ndt.build_target(ncfg, tgt_j, capacity=1 << 15, baked=True)
    run("ndt_p2d", lambda s: register.ndt.align(ng, nmap, s, cfg=ncfg).pose)

    def d2d(s):
        sm, sc, sv, _ = register.ndt.voxelize_source(ncfg, s)
        return register.ndt.align_d2d(ng, nmap, sm, sc, sv, cfg=ncfg).pose
    run("ndt_d2d", d2d)

    vcfg = register.VGICPConfig(resolution=1.0)
    vg, vmap = register.vgicp.build_target(vcfg, tgt_j, capacity=1 << 15, baked=True)
    run("vgicp_knn", lambda s: register.vgicp.align(
        vg, vmap, s, register.source_covariances(s, mask, k=8, resolution=1.0), mask, cfg=vcfg).pose)
    run("vgicp_rbf", lambda s: register.vgicp.align(
        vg, vmap, s, register.source_covariances_rbf(s, mask, resolution=1.0, kernel_width=0.5),
        mask, cfg=vcfg).pose)

    gcfg = register.GICPConfig()
    ggrid_cfg, ggrid, gatt = register.gicp.build_target(gcfg, tgt_j)
    run("gicp", lambda s: register.gicp.align(
        ggrid_cfg, ggrid, gatt, s, register.source_covariances(s, mask, k=8, resolution=1.0),
        mask, cfg=gcfg).pose)

    return {"pairwise_n_pts": n, "pairwise_tunnel_floor_ms": round(floor_ms, 2),
            "pairwise": table}


def config8_localization():
    """Prior-map localization at product shape (VERDICT r4 missing #3) — the
    deployed mode the reference runs at lidar rate with a
    MultiThreadedSpinner(6) (src/jueying_slam/src/new_localization.cpp:77-2081).
    Measures: sequential feature-LOAM tile localization fps (64-frame chain in
    one program, carry pose = product data dependency), single-frame latency,
    and relocalization latency after an induced 5 m loss (the
    laserCloudInfoHandler :424-476 fitness gate -> relocalize -> re-match
    sequence)."""
    from pointcloud_slam_tpu.geom import se3
    from pointcloud_slam_tpu.models.liosam import scan2map as s2m
    from pointcloud_slam_tpu.models.localization import pipeline as loc
    from pointcloud_slam_tpu import ops

    Nc, Ns, M = 512, 2048, 64
    corners_w, surfs_w = synthetic.make_feature_world(seed=3)
    # degeneracy_eig=1.0: the prior-map insert keeps <=8 pts/voxel at 0.8 m,
    # so Hessian eigenvalues sit far below the raw reference threshold (100)
    # — at 100 the projection clamps ~2 cm of every update and the chain
    # lags into divergence (measured: 0.027 -> 0.32 m over 16 frames)
    cfg = loc.LocalizationConfig(
        scan2map=s2m.Scan2MapConfig(solver=register.SolverConfig(max_iterations=6),
                                    degeneracy_eig=1.0))
    cmap = ops.insert(cfg.scan2map.corner_grid, ops.create(cfg.scan2map.corner_grid),
                      jnp.asarray(corners_w.T.astype(np.float32)),
                      jnp.ones(len(corners_w), bool))
    smap = ops.insert(cfg.scan2map.surf_grid, ops.create(cfg.scan2map.surf_grid),
                      jnp.asarray(surfs_w.T.astype(np.float32)),
                      jnp.ones(len(surfs_w), bool))

    # circular trajectory inside the map; scans in the sensor frame
    cs, cms, ss, sms, gts = [], [], [], [], []
    for k in range(M):
        ang = 2 * np.pi * k / M
        t = np.array([3.0 * np.sin(ang), 3.0 * (1 - np.cos(ang)), 1.0], np.float32)
        R = np.eye(3, dtype=np.float32)
        c, cm = synthetic.take_scan(corners_w, R, t, Nc, seed=k)
        s, sm = synthetic.take_scan(surfs_w, R, t, Ns, seed=100 + k)
        cs.append(c.T); cms.append(cm); ss.append(s.T); sms.append(sm); gts.append(t)
    cs = jnp.asarray(np.stack(cs).astype(np.float32))
    cms = jnp.asarray(np.stack(cms)); ss = jnp.asarray(np.stack(ss).astype(np.float32))
    sms = jnp.asarray(np.stack(sms)); gts = np.stack(gts)

    @jax.jit
    def chain(cmap, smap, cs, cms, ss, sms):
        # constant-velocity prediction between scans — the TransformFusion /
        # fused-odometry init the deployed localizer matches from
        # (new_localization.cpp receives odometry-rate initial guesses);
        # matching from the RAW previous pose lags ~2 cm/frame and drifts
        def step(carry, xs):
            pose, prev_t = carry
            c, cm, s, sm = xs
            init = se3.Pose(pose.R, pose.t + (pose.t - prev_t))
            res = loc.localize_loam(cfg, None, cmap, smap, c, cm, s, sm, init)
            return (res.pose, pose.t), (res.pose.t, res.fitness, res.lost)
        p0 = se3.Pose(jnp.eye(3), jnp.asarray(gts[0]))
        _, (ts, fit, lost) = jax.lax.scan(step, (p0, p0.t), (cs, cms, ss, sms))
        return ts, fit, lost

    ts, fit, lost = jax.tree.map(np.asarray, chain(cmap, smap, cs, cms, ss, sms))
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        ts = np.asarray(chain(cmap, smap, cs, cms, ss, sms)[0])
    per_frame = (time.perf_counter() - t0) / (reps * M)
    err = float(np.max(np.linalg.norm(ts - gts, axis=1)))

    one = jax.jit(lambda c, cm, s, sm, p: loc.localize_loam(cfg, None, cmap, smap, c, cm, s, sm, p))
    p0 = se3.Pose(jnp.eye(3), jnp.asarray(gts[0]))
    _ = np.asarray(one(cs[0], cms[0], ss[0], sms[0], p0).pose.t)
    t0 = time.perf_counter()
    for k in range(4):
        _ = np.asarray(one(cs[k], cms[k], ss[k], sms[k],
                           se3.Pose(jnp.eye(3), jnp.asarray(gts[k]))).pose.t)
    lat_ms = (time.perf_counter() - t0) / 4 * 1e3

    # relocalization: teleported init -> lost; fallback (GPS/initialPose
    # role) -> re-match. Latency = the whole detect+recover+rematch sequence.
    # The teleport includes +2 m z: the fitness gate must catch it even
    # where the floor plane makes horizontal offsets fitness-blind.
    bad_init = se3.Pose(jnp.eye(3), jnp.asarray(gts[7] + np.array([5.0, 5.0, 2.0], np.float32)))
    fb = se3.Pose(jnp.eye(3), jnp.asarray(gts[7]))

    @jax.jit
    def recover(c, cm, s, sm):
        r1 = loc.localize_loam(cfg, None, cmap, smap, c, cm, s, sm, bad_init)
        p2 = loc.relocalize(r1, fb)
        r2 = loc.localize_loam(cfg, None, cmap, smap, c, cm, s, sm, p2)
        return r1.lost, r2.lost, r2.pose.t, r2.fitness

    l1, l2, t2, f2 = jax.tree.map(np.asarray, recover(cs[7], cms[7], ss[7], sms[7]))
    t0 = time.perf_counter()
    for _ in range(3):
        l1, l2, t2, f2 = jax.tree.map(np.asarray, recover(cs[7], cms[7], ss[7], sms[7]))
    reloc_ms = (time.perf_counter() - t0) / 3 * 1e3
    reloc_err = float(np.linalg.norm(t2 - gts[7]))
    return {"localization_fps": round(1.0 / per_frame, 1),
            "localization_err_max_m": round(err, 4),
            "localization_latency_ms": round(lat_ms, 2),
            "localization_lost_frames": int(np.sum(lost)),
            "reloc_latency_ms": round(reloc_ms, 2),
            "reloc_triggered": bool(l1), "reloc_recovered": bool(~l2),
            "reloc_err_m": round(reloc_err, 4)}


def config6_slam():
    """Full LIO-SAM slam_step throughput at PRODUCT scale, at TWO graph
    sizes: max_keyframes=512 (the run_slam_offline default; fresh + revisit
    shapes) and max_keyframes=4096 (reference-scale trajectory, revisit
    shape — VERDICT r4 next #1b: slam_step proven at KF>=4096 with a
    populated graph). Also records:
      - a three-way per-frame latency split on the revisit shape (plain /
        detection / drain p50+p99, VERDICT r4 next #6 — the reference pays
        verification on the loop thread, mapOptmization.cpp:683-731),
      - the fresh-shape error decomposition (frame0 latch vs drift-per-meter,
        VERDICT r4 next #9) with the 0.01 m/m drift gate."""
    out = _slam_bench(KF=512, PRE=480, suffix="", shapes=("fresh", "revisit"))
    out.update(_slam_bench(KF=4096, PRE=4064, suffix="_kf4096", shapes=("revisit",)))
    out["slam_step_kf"] = 512
    out["slam_step_kf_max"] = 4096
    return out


def _slam_bench(KF, PRE, suffix, shapes):
    from pointcloud_slam_tpu.geom import se3
    from pointcloud_slam_tpu.models.liosam import backend as bk
    from pointcloud_slam_tpu.models.liosam import scan2map as s2m
    from pointcloud_slam_tpu.models.liosam import scancontext as scm
    from pointcloud_slam_tpu.models.liosam import slam

    n_corner, n_surf, n_frames = 512, 2048, 32
    KF_DT = 0.5  # prepopulated keyframe time spacing [s]
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

    rng = np.random.default_rng(7)
    eye3 = np.eye(3, dtype=np.float32)
    circle = lambda ang: np.array([6.0 * np.cos(ang) - 6.0, 6.0 * np.sin(ang), 1.0], np.float32)

    def scan_at(t, seed):
        c, cm = synthetic.take_scan(corners_w, eye3, t, n_corner, seed=seed)
        s, sm = synthetic.take_scan(surfs_w, eye3, t, n_surf, seed=1000 + seed)
        return c, cm, s, sm

    desc_fn = jax.jit(jax.vmap(lambda p, m: scm.make_descriptor(cfg.scancontext, p, m)))
    rebuild_jit = jax.jit(lambda state, pt: slam._rebuild_maps(cfg, state, state.graph, pt))

    def populate(state, poses_t, clouds):
        """Fill the graph + keyframe stores with PRE keyframes along poses_t."""
        g = state.graph
        odom_t = np.zeros((KF, 3), np.float32)
        odom_t[1:PRE] = poses_t[1:] - poses_t[:-1]
        t_all = np.zeros((KF, 3), np.float32)
        t_all[:PRE] = poses_t
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
        g = g._replace(
            t=jnp.asarray(t_all), n=jnp.asarray(PRE, jnp.int32),
            odom_t=jnp.asarray(odom_t), odom_info=jnp.asarray(oinfo),
        )
        state = state._replace(
            graph=g, kf_corner=jnp.asarray(kf_c), kf_corner_mask=jnp.asarray(kf_cm),
            kf_surf=kf_s_j, kf_surf_mask=kf_sm_j,
            sc_descs=descs, sc_keys=keys,
            kf_time=jnp.asarray(kf_time),
            pose=se3.Pose(state.pose.R, jnp.asarray(poses_t[-1])),
            # frame clock consistent with the keyframe stamps (0.1 s scans)
            frame_idx=jnp.asarray(int(PRE * KF_DT / cfg.nominal_scan_period), jnp.int32),
        )
        # steady-state local maps: the surrounding-keyframe rebuild at the
        # current pose (exactly what a loop-event rebuild produces)
        cmap, smap = rebuild_jit(state, state.graph.t[PRE - 1])
        return state._replace(corner_map=cmap, surf_map=smap)

    def fresh_shape():
        # ---- shape A (fresh): straight approach along -y ending at the
        # circle start; only the last ~24 keyframes are inside the feature
        # world and carry real scans (the rest are noise clouds far outside
        # RS range) ----
        step_len = 0.32   # just over the 0.3 m keyframe gate
        ys = -step_len * np.arange(PRE - 1, -1, -1) - 0.35
        poses_a = np.stack([np.zeros(PRE), ys, np.ones(PRE)], 1).astype(np.float32)
        clouds_a = []
        for i in range(PRE):
            if ys[i] > -10.0:
                clouds_a.append(scan_at(poses_a[i], seed=5000 + i))
            else:
                c = rng.uniform(-8, 8, (n_corner, 3)).astype(np.float32) + poses_a[i]
                s = rng.uniform(-8, 8, (n_surf, 3)).astype(np.float32) + poses_a[i]
                clouds_a.append((c, np.ones(n_corner, bool), s, np.ones(n_surf, bool)))
        return poses_a, clouds_a, 0.0

    # revisit keyframe chord 0.36 m — just over the 0.3 m gate, so the first
    # measured frame starts within the baked grids' capture basin
    KF_ANG = 0.04 * 1.5

    def revisit_shape():
        # ---- shape B (revisit): PRE keyframes along the same circle the
        # measured frames continue (all real scans, >30 s old) ----
        poses_b = np.stack([circle(KF_ANG * i) for i in range(PRE)]).astype(np.float32)
        clouds_b = [scan_at(poses_b[i], seed=6000 + i) for i in range(PRE)]
        return poses_b, clouds_b, KF_ANG * PRE

    def frames(ang0):
        cs, cms, ss, sms, gts = [], [], [], [], []
        for k in range(n_frames):
            t = circle(ang0 + 0.04 * k)
            c, cm, s, sm = scan_at(t, seed=k)
            cs.append(soa(c)); cms.append(jnp.asarray(cm)); ss.append(soa(s)); sms.append(jnp.asarray(sm))
            gts.append(t)
        return jnp.stack(cs), jnp.stack(cms), jnp.stack(ss), jnp.stack(sms), np.stack(gts)

    @jax.jit
    def run_all(state, cs, cms, ss, sms):
        def body(st, inp):
            c, cm, s, sm = inp
            st, out = slam.slam_step(cfg, st, c, cm, s, sm)
            return st, (out.pose.t, out.loop_detected)
        return jax.lax.scan(body, state, (cs, cms, ss, sms))

    step1 = jax.jit(lambda st, c, cm, s, sm: slam.slam_step(cfg, st, c, cm, s, sm))

    shape_fns = {"fresh": ("", fresh_shape), "revisit": ("_revisit", revisit_shape)}
    out = {}
    for shape in shapes:
        name, fn = shape_fns[shape]
        name += suffix
        poses, clouds, ang0 = fn()
        state0 = populate(slam.create_state(cfg), poses, clouds)
        cs, cms, ss, sms, gts = frames(ang0)
        st1, (ts, loops) = run_all(state0, cs, cms, ss, sms)
        ts = np.asarray(ts)
        err = float(np.linalg.norm(ts[-1] - gts[-1]))
        n_loops = int(np.asarray(loops).sum())
        reps = 3
        t0 = time.perf_counter()
        for _ in range(reps):
            _, (ts_r, _l) = run_all(state0, cs, cms, ss, sms)
            _ = np.asarray(ts_r)
        dt = (time.perf_counter() - t0) / (reps * n_frames)
        out[f"slam_step_fps{name}"] = round(1.0 / dt, 2)
        out[f"slam_final_err_m{name}"] = round(err, 4)
        out[f"slam_loops{name}"] = n_loops

        if shape == "fresh":
            # error decomposition (VERDICT r4 next #9): the frame-0 latch is
            # the one-time capture-basin snap at the approach/circle seam;
            # drift is the per-meter accumulation after it — the regression
            # the conflated final_err number used to hide
            errs = np.linalg.norm(ts - gts, axis=1)
            path = float(np.sum(np.linalg.norm(np.diff(gts, axis=0), axis=1)))
            latch = float(errs[0])
            drift_per_m = float((errs[-1] - latch) / max(path, 1e-9))
            out[f"slam_frame0_latch_m{suffix}"] = round(latch, 4)
            out[f"slam_drift_m_per_m{suffix}"] = round(drift_per_m, 5)
            out[f"slam_drift_gate_ok{suffix}"] = bool(abs(drift_per_m) <= 0.01)

        if shape == "revisit":
            # three-way per-frame latency split (VERDICT r4 next #6): plain /
            # detection (a loop factor landed this frame) / drain (deferred
            # sweeps running). Per-frame readback includes the axon tunnel
            # floor — reported so device share can be separated.
            # warm the single-step program so its compile (and the deferred
            # drain branch's) stays out of the measured percentiles
            st_w, o_w = step1(state0, cs[0], cms[0], ss[0], sms[0])
            for _k in range(1, min(12, n_frames)):
                st_w, o_w = step1(st_w, cs[_k], cms[_k], ss[_k], sms[_k])
            _ = np.asarray(o_w.pose.t)
            lat, cls = [], []
            for rep in range(2):
                st = state0
                prev_pending = 0
                for k in range(n_frames):
                    t0 = time.perf_counter()
                    st, o = step1(st, cs[k], cms[k], ss[k], sms[k])
                    # ONE host fetch (each separate readback would pay the
                    # full tunnel roundtrip and poison the timing)
                    _t, looped, pending = jax.device_get(
                        (o.pose.t, o.loop_detected, o.opt_pending))
                    lat.append((time.perf_counter() - t0) * 1e3)
                    # opt_pending is post-decrement: the final drain frame
                    # reads 0 but still paid a sweep — prev_pending covers it
                    cls.append("loop" if bool(looped)
                               else ("drain" if int(pending) > 0 or prev_pending > 0
                                     else "plain"))
                    prev_pending = int(pending)
            lat = np.asarray(lat)
            for c in ("plain", "loop", "drain"):
                sel = lat[[i for i, x in enumerate(cls) if x == c]]
                if len(sel):
                    out[f"slam_frame_{c}_p50_ms{name}"] = round(float(np.percentile(sel, 50)), 1)
                    out[f"slam_frame_{c}_p99_ms{name}"] = round(float(np.percentile(sel, 99)), 1)
                    out[f"slam_frame_{c}_count{name}"] = int(len(sel))
            noop = jax.jit(lambda s: s[:, 0] + 1.0)
            _ = np.asarray(noop(cs[0]))
            t0 = time.perf_counter()
            for f in range(4):
                _ = np.asarray(noop(cs[f % n_frames]))
            out[f"slam_frame_tunnel_floor_ms{suffix}"] = round(
                (time.perf_counter() - t0) / 4 * 1e3, 1)
    return out


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
        fns = {1: config1_icp, 2: config2_ndt, 3: config3_lio, 4: config4_occupancy,
               5: config5_backend, 6: config6_slam, 7: config7_pairwise,
               8: config8_localization}
        out = fns[args.only]()
        print(json.dumps(out if isinstance(out, dict) else {"fps": out[0], **out[1]}))
        return

    fps, det1 = config1_icp()
    secondary = {}
    if not args.skip_secondary:
        for fn in (config2_ndt, config3_lio, config4_occupancy, config5_backend,
                   config6_slam, config7_pairwise, config8_localization):
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
