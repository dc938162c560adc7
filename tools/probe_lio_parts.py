#!/usr/bin/env python
"""Measure LIO part costs + actual survivor/insert counts (dev tool)."""
import sys, time
sys.path.insert(0, ".")
import numpy as np, jax, jax.numpy as jnp
from pointcloud_slam_tpu import ops
from pointcloud_slam_tpu.io import synthetic
from pointcloud_slam_tpu.models import lio
from tools.profile_lio import build_frames

B = 32
cfg = lio.LIOConfig(
    grid=ops.GridConfig(capacity=1 << 17, pts_per_voxel=4, resolution=0.4, nearby=7, probe=4, claim_rounds=2),
    scan_leaf=0.3, map_leaf=0.3, init_imu_frames=1,
    scan_budget=8192, insert_budget=4096,
)
frames = build_frames(2 * B)
stacked = [jax.tree.map(lambda *xs: jnp.stack(xs), *frames[i:i + B]) for i in (0, B)]

@jax.jit
def run_block(state, fr_block):
    def body(s, fr):
        s, out = lio.lio_step(cfg, s, fr)
        return s, (out.pos, out.num_effective)
    return jax.lax.scan(body, state, fr_block)

state, _ = run_block(lio.create_state(cfg), stacked[0])
state, (ps, neff) = run_block(state, stacked[1])
print("num_effective (post-downsample survivors) last block:", np.asarray(neff)[-8:])

# actual gated insert count: instrument one frame manually
from pointcloud_slam_tpu.models.lio import eskf, imu
from pointcloud_slam_tpu.models.lio.pipeline import _map_insert_mask, _obs_model
fr = jax.tree.map(lambda a: a[-1], stacked[1])
Q = eskf.process_noise_cov(jnp.float32, cfg.gyr_cov, cfg.acc_cov, cfg.b_gyr_cov, cfg.b_acc_cov)

@jax.jit
def one(state, fr):
    x_end, P_end, table = imu.propagate(
        state.x, state.P, Q, fr.imu_acc, fr.imu_gyro, fr.imu_dt, fr.imu_offs,
        fr.imu_mask, state.acc_scale, state.prev_acc_w, state.prev_gyro)
    pts_u = imu.undistort(fr.pts, fr.t_offs, fr.pt_mask, table, x_end)
    pts_d, mask_d = ops.voxel_downsample(pts_u, fr.pt_mask, cfg.scan_leaf)
    pts_d, mask_d = ops.compact(pts_d, mask_d, cfg.scan_budget)
    body_norm = jnp.sqrt(jnp.sum(pts_d * pts_d, axis=0))
    tbl = ops.knn_table(cfg.grid, state.grid)
    obs = _obs_model(cfg, state.grid, pts_d, body_norm, mask_d, tbl=tbl)
    upd = eskf.update_iterated(x_end, P_end, obs, cfg.laser_point_cov, cfg.max_iterations, cfg.epsi)
    R_wl = upd.x.rot @ upd.x.ext_R
    t_wl = upd.x.rot @ upd.x.ext_t + upd.x.pos
    pw = R_wl @ pts_d + t_wl[:, None]
    _, _, nbrs, d2, cnt = upd.cache
    ins_mask = _map_insert_mask(cfg, pw, mask_d, nbrs, d2, cnt)
    return jnp.sum(mask_d), jnp.sum(ins_mask)

nd, ni = one(state, fr)
print("downsample survivors:", int(nd), " gated inserts:", int(ni))

# part costs, chained x B
world = synthetic.make_room_cloud(80_000, seed=3, size=30.0)
rng = np.random.default_rng(0)
pts20 = jnp.asarray(world[rng.choice(len(world), 20_000)].T.astype(np.float32))
mask20 = jnp.ones(20_000, bool)

def timeit(tag, f, reps=3):
    _ = np.asarray(jax.tree.leaves(f())[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        _ = np.asarray(jax.tree.leaves(f())[0].ravel()[0])
    dt = (time.perf_counter() - t0) / reps
    print(f"{tag:48s} {dt*1e3:9.2f} ms block  {dt*1e3/B:7.3f} ms/op", flush=True)

stack20 = jnp.broadcast_to(pts20, (B, 3, 20_000))
timeit("voxel_downsample 20k", jax.jit(lambda: jax.lax.map(lambda p: ops.voxel_downsample(p, mask20, 0.3)[0][:, 0], stack20)))
timeit("voxel_downsample+compact8192 20k", jax.jit(lambda: jax.lax.map(
    lambda p: ops.compact(*ops.voxel_downsample(p, mask20, 0.3), 8192)[0][:, 0], stack20)))

for n in (4096, 2048, 1024):
    for rounds in (2, 1):
        g0 = state.grid
        cfgn = cfg.grid if rounds == 2 else ops.GridConfig(**{**cfg.grid.__dict__, "claim_rounds": 1})
        sub = pts20[:, :n]
        msub = jnp.ones(n, bool)
        def chain_insert(cfgn=cfgn, g0=g0, sub=sub, msub=msub):
            def body(g, _):
                return ops.insert(cfgn, g, sub, msub), 0
            g, _ = jax.lax.scan(body, g0, jnp.arange(B))
            return g.npts
        timeit(f"insert n={n} rounds={rounds}", jax.jit(chain_insert))

# --- where does the FULL-step extra go? carry grid, toggle insert / table rebuild
from pointcloud_slam_tpu.models.lio import eskf as _eskf

def full_variant(do_insert=True, rebuild_tbl=True):
    def step(carry, fr):
        s_x, s_P, grid, paw, pg, tbl0 = carry
        x_end, P_end, table = imu.propagate(
            s_x, s_P, Q, fr.imu_acc, fr.imu_gyro, fr.imu_dt, fr.imu_offs,
            fr.imu_mask, state.acc_scale, paw, pg)
        pts_u = imu.undistort(fr.pts, fr.t_offs, fr.pt_mask, table, x_end)
        pts_d, mask_d = ops.voxel_downsample(pts_u, fr.pt_mask, cfg.scan_leaf)
        pts_d, mask_d = ops.compact(pts_d, mask_d, cfg.scan_budget)
        body_norm = jnp.sqrt(jnp.sum(pts_d * pts_d, axis=0))
        tbl = ops.knn_table(cfg.grid, grid) if rebuild_tbl else tbl0
        obs = _obs_model(cfg, grid, pts_d, body_norm, mask_d, tbl=tbl)
        upd = eskf.update_iterated(x_end, P_end, obs, cfg.laser_point_cov, cfg.max_iterations, cfg.epsi)
        R_wl = upd.x.rot @ upd.x.ext_R
        t_wl = upd.x.rot @ upd.x.ext_t + upd.x.pos
        pw = R_wl @ pts_d + t_wl[:, None]
        _, _, nbrs, d2, cnt = upd.cache
        ins_mask = _map_insert_mask(cfg, pw, mask_d, nbrs, d2, cnt)
        pw, ins_mask = ops.compact(pw, ins_mask, cfg.insert_budget)
        if do_insert:
            grid = ops.insert(cfg.grid, grid, pw, ins_mask)
        last = jnp.maximum(jnp.sum(fr.imu_mask.astype(jnp.int32)), 1)
        return (upd.x, upd.P, grid, table.acc[last], table.gyro[last], tbl0), upd.x.pos

    @jax.jit
    def run():
        tbl0 = ops.knn_table(cfg.grid, state.grid)
        init = (state.x, state.P, state.grid, state.prev_acc_w, state.prev_gyro, tbl0)
        _, outs = jax.lax.scan(step, init, stacked[1])
        return outs
    return run

timeit("full variant: insert+rebuild (== lio_step)", full_variant(True, True))
timeit("full variant: insert, NO tbl rebuild", full_variant(True, False))
timeit("full variant: NO insert, rebuild", full_variant(False, True))
timeit("full variant: NO insert, NO rebuild", full_variant(False, False))

# --- rebuild-strategy variants inside the REAL pipeline
def full_variant2(mode):
    """mode: 'roll' (current), 'slice' (pad+slice build), 'stale4' (rebuild every 4)."""
    Pp = cfg.grid.probe
    C = cfg.grid.capacity
    K = cfg.grid.pts_per_voxel

    def build_slice(grid):
        fp_cnt = (grid.fp & jnp.uint32(0xFFFFFFC0)) | jnp.minimum(grid.npts, K).astype(jnp.uint32)
        base = jnp.concatenate([fp_cnt[None, :], jax.lax.bitcast_convert_type(grid.pts.reshape(3 * K, C), jnp.uint32)], 0)
        xp = jnp.concatenate([base, base[:, :Pp]], axis=1)
        xp = jax.lax.optimization_barrier(xp)
        return jnp.concatenate([jax.lax.slice(xp, (0, j), (1 + 3 * K, j + C)) for j in range(Pp)], 0)

    def step(carry, inp):
        i, fr = inp
        s_x, s_P, grid, paw, pg, tbl_c = carry
        x_end, P_end, table = imu.propagate(
            s_x, s_P, Q, fr.imu_acc, fr.imu_gyro, fr.imu_dt, fr.imu_offs,
            fr.imu_mask, state.acc_scale, paw, pg)
        pts_u = imu.undistort(fr.pts, fr.t_offs, fr.pt_mask, table, x_end)
        pts_d, mask_d = ops.voxel_downsample(pts_u, fr.pt_mask, cfg.scan_leaf)
        pts_d, mask_d = ops.compact(pts_d, mask_d, cfg.scan_budget)
        body_norm = jnp.sqrt(jnp.sum(pts_d * pts_d, axis=0))
        if mode == "roll":
            tbl = ops.knn_table(cfg.grid, grid)
        elif mode == "slice":
            tbl = build_slice(grid)
        else:  # stale4
            tbl = jax.lax.cond(i % 4 == 0, lambda: ops.knn_table(cfg.grid, grid), lambda: tbl_c)
            tbl_c = tbl
        obs = _obs_model(cfg, state.grid if False else grid, pts_d, body_norm, mask_d, tbl=tbl)
        upd = eskf.update_iterated(x_end, P_end, obs, cfg.laser_point_cov, cfg.max_iterations, cfg.epsi)
        R_wl = upd.x.rot @ upd.x.ext_R
        t_wl = upd.x.rot @ upd.x.ext_t + upd.x.pos
        pw = R_wl @ pts_d + t_wl[:, None]
        _, _, nbrs, d2, cnt = upd.cache
        ins_mask = _map_insert_mask(cfg, pw, mask_d, nbrs, d2, cnt)
        pw, ins_mask = ops.compact(pw, ins_mask, cfg.insert_budget)
        grid = ops.insert(cfg.grid, grid, pw, ins_mask)
        last = jnp.maximum(jnp.sum(fr.imu_mask.astype(jnp.int32)), 1)
        return (upd.x, upd.P, grid, table.acc[last], table.gyro[last], tbl_c), upd.x.pos

    @jax.jit
    def run():
        tbl0 = ops.knn_table(cfg.grid, state.grid)
        init = (state.x, state.P, state.grid, state.prev_acc_w, state.prev_gyro, tbl0)
        _, outs = jax.lax.scan(step, init, (jnp.arange(B), stacked[1]))
        return outs
    return run

timeit("full2 roll  (current)", full_variant2("roll"))
timeit("full2 slice build", full_variant2("slice"))
timeit("full2 stale4", full_variant2("stale4"))
