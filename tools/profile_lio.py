#!/usr/bin/env python
"""Stage-level TPU timing of the LIO frame step (dev tool).

Builds the bench config-3 workload (20k-pt frames, 20 IMU samples), then
times truncated variants of `lio_step`'s run branch — each chained over a
40-frame block with a single readback, so the ~40 ms axon tunnel floor is
amortized exactly like the bench. Differences between consecutive rows are
per-stage costs. The grid is held fixed for the truncated rows (insert cost
is measured separately by the full-step minus no-insert row).
"""
import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from pointcloud_slam_tpu import ops  # noqa: E402
from pointcloud_slam_tpu.geom import fit  # noqa: E402
from pointcloud_slam_tpu.io import feed, synthetic  # noqa: E402
from pointcloud_slam_tpu.models import lio  # noqa: E402
from pointcloud_slam_tpu.models.lio import eskf, imu  # noqa: E402
from pointcloud_slam_tpu.models.lio.pipeline import _map_insert_mask, _obs_model  # noqa: E402


def build_frames(n_frames, n_pts=20_000, n_imu=20):
    world = synthetic.make_room_cloud(80_000, seed=3, size=30.0)
    traj = synthetic.make_imu_trajectory(n_frames + 1, imu_per_frame=n_imu, frame_dt=0.1, seed=3)
    rng = np.random.default_rng(3)
    frames = []
    for f in range(n_frames):
        i0, i1 = f * n_imu, (f + 1) * n_imu
        pos, R = traj["pos"][i1], traj["R"][i1]
        rel = (world - pos) @ R
        r = np.linalg.norm(rel, axis=1)
        vis = rel[(r < 30.0) & (r > 0.3)]
        pts = vis[rng.choice(len(vis), size=min(n_pts, len(vis)), replace=False)].astype(np.float32)
        imu_t = (traj["t"][i0 + 1 : i1 + 1] - traj["t"][i0]).astype(np.float32)
        frames.append(feed.make_frame(
            pts, np.full(len(pts), 0.1, np.float32), traj["acc"][i0:i1], traj["gyro"][i0:i1],
            imu_t, n_points=n_pts, n_imu=n_imu, prev_imu_t=0.0,
        ))
    return frames


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--block", type=int, default=40)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--scan_budget", type=int, default=8192)
    ap.add_argument("--platform", default="")
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    cfg = lio.LIOConfig(
        grid=ops.GridConfig(capacity=1 << 17, pts_per_voxel=4, resolution=0.4, nearby=7, probe=4, claim_rounds=2),
        scan_leaf=0.3, map_leaf=0.3, init_imu_frames=1,
        scan_budget=args.scan_budget, insert_budget=4096,
        max_iterations=args.iters,
    )
    B = args.block
    frames = build_frames(2 * B)
    stacked = [jax.tree.map(lambda *xs: jnp.stack(xs), *frames[i : i + B]) for i in (0, B)]

    # run the real loop over block 0 to get a populated, representative state
    @jax.jit
    def run_block(state, fr_block):
        def body(s, fr):
            s, out = lio.lio_step(cfg, s, fr)
            return s, out.pos
        return jax.lax.scan(body, state, fr_block)

    state0 = lio.create_state(cfg)
    state, _ = run_block(state0, stacked[0])
    state = jax.tree.map(lambda a: np.asarray(a), state)  # materialize
    state = jax.tree.map(jnp.asarray, state)
    blk = stacked[1]

    Q = eskf.process_noise_cov(jnp.float32, cfg.gyr_cov, cfg.acc_cov, cfg.b_gyr_cov, cfg.b_acc_cov)

    def make_stage(upto, n_iter=None):
        """Truncated run-branch as a chained scan over the block; grid fixed."""
        grid = state.grid

        def step(carry, fr):
            x, P, paw, pg = carry
            x_end, P_end, table = imu.propagate(
                x, P, Q, fr.imu_acc, fr.imu_gyro, fr.imu_dt, fr.imu_offs,
                fr.imu_mask, state.acc_scale, paw, pg)
            out = x_end.pos
            if upto >= 1:
                pts_u = imu.undistort(fr.pts, fr.t_offs, fr.pt_mask, table, x_end)
                out = pts_u[:, 0]
            if upto >= 2:
                pts_d, mask_d = ops.voxel_downsample(pts_u, fr.pt_mask, cfg.scan_leaf)
                if cfg.scan_budget:
                    pts_d, mask_d = ops.compact(pts_d, mask_d, cfg.scan_budget)
                out = pts_d[:, 0]
            if upto >= 3:
                tbl = ops.knn_table(cfg.grid, grid)
                body_norm = jnp.sqrt(jnp.sum(pts_d * pts_d, axis=0))
            if upto == 3:
                # one raw search + plane fit, no ESKF
                R_wl = x_end.rot @ x_end.ext_R
                t_wl = x_end.rot @ x_end.ext_t + x_end.pos
                pw = R_wl @ pts_d + t_wl[:, None]
                nbrs, d2, cnt, _ = ops.knn(cfg.grid, grid, pw, k=cfg.num_match, max_range=cfg.knn_max_dist, tbl=tbl)
                nmask = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 0) < cnt[None, :]
                coef, okp = fit.plane_fit(nbrs, nmask, cfg.plane_threshold, cfg.min_match)
                out = coef[3]
            if upto >= 4:
                obs = _obs_model(cfg, grid, pts_d, body_norm, mask_d, tbl=tbl)
                upd = eskf.update_iterated(
                    x_end, P_end, obs, cfg.laser_point_cov,
                    n_iter or cfg.max_iterations, cfg.epsi)
                x_end = upd.x
                P_end = upd.P
                out = upd.x.pos
            if upto >= 5:
                R_wl = upd.x.rot @ upd.x.ext_R
                t_wl = upd.x.rot @ upd.x.ext_t + upd.x.pos
                pw = R_wl @ pts_d + t_wl[:, None]
                _, _, nbrs, d2, cnt = upd.cache
                ins_mask = _map_insert_mask(cfg, pw, mask_d, nbrs, d2, cnt)
                pw, ins_mask = ops.compact(pw, ins_mask, cfg.insert_budget)
                out = pw[:, 0] + ins_mask[0]
            last = jnp.maximum(jnp.sum(fr.imu_mask.astype(jnp.int32)), 1)
            return (x_end, P_end, table.acc[last], table.gyro[last]), out

        @jax.jit
        def run():
            init = (state.x, state.P, state.prev_acc_w, state.prev_gyro)
            _, outs = jax.lax.scan(step, init, blk)
            return outs
        return run

    def timeit(tag, f, reps=3):
        _ = np.asarray(jax.tree.leaves(f())[0].ravel()[0])
        t0 = time.perf_counter()
        for _ in range(reps):
            _ = np.asarray(jax.tree.leaves(f())[0].ravel()[0])
        dt = (time.perf_counter() - t0) / reps
        per = dt * 1e3 / B
        print(f"{tag:46s} {dt*1e3:9.2f} ms block   {per:7.3f} ms/frame", flush=True)
        return per

    rows = [
        ("propagate only", make_stage(0)),
        ("+ undistort", make_stage(1)),
        ("+ downsample/compact", make_stage(2)),
        ("+ 1 raw knn+planefit (no eskf)", make_stage(3)),
        (f"+ eskf update ({args.iters} iters)", make_stage(4)),
        ("+ eskf update (1 iter)", make_stage(4, n_iter=1)),
        ("+ eskf update (2 iters)", make_stage(4, n_iter=2)),
        ("+ insert gating/compact (no scatter)", make_stage(5)),
    ]
    for tag, f in rows:
        timeit(tag, f)

    @jax.jit
    def full():
        _, outs = run_block(state, blk)
        return outs
    timeit("FULL lio_step (incl. map scatter)", full)


if __name__ == "__main__":
    main()
