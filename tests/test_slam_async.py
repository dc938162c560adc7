"""Asynchronous loop handling: deferred full-graph solve + fixed-cadence
loop detection + the synthesized RS time-gate clock.

Reference behaviors under test (src/jueying_slam/src/mapOptmization.cpp):
  - the 1 Hz loop-closure thread detects loops regardless of keyframe
    creation (:592-605) — a robot pausing inside a revisit still closes,
  - loop corrections are absorbed incrementally (iSAM2, :1835-1850) instead
    of stalling the mapping thread for a batch solve,
  - the RS channel's 30 s time gate (historyKeyframeSearchTimeDiff, :857)
    must hold even when the caller supplies no timestamps (slam_step
    synthesizes time = frame_idx * nominal_scan_period).

One shared config -> one compile for the whole file (1-core box).
"""

import numpy as np
import jax
import jax.numpy as jnp

from pointcloud_slam_tpu.io import synthetic
from pointcloud_slam_tpu.models.liosam import slam, scan2map as s2m, backend as bk, scancontext as sc
from pointcloud_slam_tpu.register import NDTConfig, SolverConfig

# SC disabled (impossible threshold): every closure here must come from the
# RS channel so the time gate is the only thing standing between a revisit
# and a loop factor.
CFG = slam.SLAMConfig(
    backend=bk.BackendConfig(max_keyframes=32, max_loops=4, keyframe_dist_thresh=0.4,
                             gn_iterations=3, pcg_iterations=30),
    n_corner=256,
    n_surf=1024,
    scan2map=s2m.Scan2MapConfig(solver=SolverConfig(max_iterations=8), degeneracy_eig=1.0),
    loop_ndt=NDTConfig(solver=SolverConfig(max_iterations=10)),
    scancontext=sc.ScanContextConfig(dist_threshold=-1.0),
    rs_loop=True,
    rs_verify="ndt",
    rs_exclude_recent=3,
    rs_time_gate=8.0,
    loop_detect_every=4,
    nominal_scan_period=0.5,   # no time_sec passed: frame clock = 0.5 s/frame
)


def soa(x):
    return jnp.asarray(np.ascontiguousarray(np.asarray(x).T))


def test_pause_closes_loop_and_defers_solve():
    """Out-and-back, then the robot PAUSES at the revisit: inline detections
    during the (fast) return are rejected by the time gate — the index gap
    alone would have closed them (the round-3 false-loop weakness) — and the
    cadence detector closes the loop on a NON-keyframe frame once the gate
    opens, after which the deferred solve drains one GN sweep per frame."""
    cfg = CFG
    corners_w, surfs_w = synthetic.make_feature_world(seed=2)
    state = slam.create_state(cfg)
    step = jax.jit(lambda st, c, cm, s, sm: slam.slam_step(cfg, st, c, cm, s, sm))

    xs = [0.0, 0.5, 1.0, 1.5, 2.0, 2.5,          # out   (frames 0-5)
          2.0, 1.5, 1.0, 0.5, 0.02]              # back  (frames 6-10)
    xs += [0.02] * 18                            # pause (frames 11-28)
    t0 = np.array([xs[0], 0.0, 1.0], np.float32)  # SLAM world frame = first sensor pose
    recs = []
    for k, x in enumerate(xs):
        t = np.array([x, 0.0, 1.0], np.float32)
        R = np.eye(3, dtype=np.float32)
        c, cm = synthetic.take_scan(corners_w, R, t, cfg.n_corner, seed=k)
        s, sm = synthetic.take_scan(surfs_w, R, t, cfg.n_surf, seed=100 + k)
        state, out = step(state, soa(c), jnp.asarray(cm), soa(s), jnp.asarray(sm))
        recs.append((bool(out.is_keyframe), bool(out.loop_detected),
                     int(out.opt_pending), float(np.linalg.norm(np.asarray(out.pose.t) - (t - t0)))))

    loops = [k for k, r in enumerate(recs) if r[1]]
    # exactly one closure, and NOT at a keyframe: the return's inline
    # detections (frames 6-10, now <= 5 s < 8 s gate) must all be rejected
    assert loops, "paused revisit must close a loop once the time gate opens"
    assert all(k > 10 for k in loops), f"loop closed during the return at {loops} — time gate failed"
    k_loop = loops[0]
    assert not recs[k_loop][0], "cadence closure must fire on a non-keyframe frame"
    # cadence: closure frame index is a multiple of loop_detect_every
    assert k_loop % cfg.loop_detect_every == 0
    # one loop factor total; later cadence ticks must not re-close (the
    # loopIndexContainer role of loop_closed_kf)
    assert int(state.graph.n_loops) == 1
    assert int(state.n_loops_found) == 1

    # deferred solve: sweeps queued on the closure frame (one ran inline),
    # then drain one per frame and stay at zero. With the PCG drain slice
    # (loop_solve_pcg_slice) the queue holds proportionally more sweeps of a
    # smaller per-sweep budget — same total Krylov work.
    n_sweeps, _pcg = slam.deferred_sweep_plan(cfg)
    pend = [r[2] for r in recs]
    assert pend[k_loop] == n_sweeps - 1
    for i in range(1, n_sweeps):
        assert pend[k_loop + i] == max(n_sweeps - 1 - i, 0)
    assert pend[-1] == 0
    # the corrected pose stays consistent with the (static) ground truth
    assert recs[-1][3] < 0.3, f"post-correction pose error {recs[-1][3]}"


def test_single_sweep_iteration_matches_full():
    """bk.optimize(g, gn_iterations=1) applied N times == bk.optimize(g) with
    gn_iterations=N (the deferred solve is the same fixed-point iteration,
    just spread over frames)."""
    cfg = bk.BackendConfig(max_keyframes=16, max_loops=4, gn_iterations=3, pcg_iterations=20)
    rng = np.random.default_rng(0)
    g = bk.create(cfg)
    n = 12
    t_true = np.stack([np.arange(n), np.zeros(n), np.zeros(n)], 1).astype(np.float32)
    drift = np.cumsum(rng.normal(0, 0.05, (n, 3)).astype(np.float32), 0)
    eye = np.broadcast_to(np.eye(3, dtype=np.float32), (n, 3, 3))
    KF = cfg.max_keyframes
    pad = lambda a, shape: np.concatenate([a, np.zeros((KF - n, *shape), np.float32)], 0)
    odom_t = np.concatenate([np.zeros((1, 3), np.float32), np.diff(t_true, axis=0)], 0)
    eyeKF = np.broadcast_to(np.eye(3, dtype=np.float32), (KF, 3, 3))
    g = g._replace(
        R=jnp.asarray(eyeKF), t=jnp.asarray(pad(t_true + drift, (3,))),
        n=jnp.asarray(n, jnp.int32),
        odom_R=jnp.asarray(eyeKF), odom_t=jnp.asarray(pad(odom_t, (3,))),
        odom_info=jnp.asarray(pad(np.full((n, 6), 1e2, np.float32), (6,))),
    )
    g = bk.add_loop(cfg, g, jnp.asarray(n - 1), jnp.asarray(0),
                    jnp.eye(3), jnp.asarray(t_true[0] - t_true[n - 1]),
                    jnp.full(6, 1e3, jnp.float32), robust=False)
    full = bk.optimize(cfg, g)
    swept = g
    for _ in range(cfg.gn_iterations):
        swept = bk.optimize(cfg, swept, gn_iterations=1)
    np.testing.assert_allclose(np.asarray(swept.t), np.asarray(full.t), atol=1e-5)
    np.testing.assert_allclose(np.asarray(swept.R), np.asarray(full.R), atol=1e-5)


def test_trust_region_bounds_gn_sweep():
    """An undamped GN sweep on a graph with a violently inconsistent loop
    factor can overshoot unboundedly (observed 1.6e5 m on TPU before the
    clamp); with cfg.max_step each sweep's largest pose move is bounded and
    the iteration stays finite."""
    cfg = bk.BackendConfig(max_keyframes=16, max_loops=4, gn_iterations=1,
                           pcg_iterations=20, max_step=2.0)
    n = 12
    KF = cfg.max_keyframes
    t_line = np.stack([np.arange(n), np.zeros(n), np.zeros(n)], 1).astype(np.float32)
    eyeKF = np.broadcast_to(np.eye(3, dtype=np.float32), (KF, 3, 3))
    pad = lambda a: np.concatenate([a, np.zeros((KF - n, 3), np.float32)], 0)
    odom_t = np.concatenate([np.zeros((1, 3), np.float32), np.diff(t_line, axis=0)], 0)
    g = bk.create(cfg)._replace(
        R=jnp.asarray(eyeKF), t=jnp.asarray(pad(t_line)), n=jnp.asarray(n, jnp.int32),
        odom_R=jnp.asarray(eyeKF), odom_t=jnp.asarray(pad(odom_t)),
        odom_info=jnp.asarray(np.concatenate(
            [np.full((n, 6), 1e2, np.float32), np.zeros((KF - n, 6), np.float32)], 0)),
    )
    # a loop factor claiming node n-1 sits 500 m from node 0 (vs the true 11)
    g_bad = bk.add_loop(cfg, g, jnp.asarray(0), jnp.asarray(n - 1),
                        jnp.eye(3), jnp.asarray([500.0, 0.0, 0.0]),
                        jnp.full(6, 1e4, jnp.float32), robust=False)
    t0 = np.asarray(g_bad.t[:n])
    stepped = bk.optimize(cfg, g_bad, gn_iterations=1)
    move = np.abs(np.asarray(stepped.t[:n]) - t0)
    assert np.isfinite(np.asarray(stepped.t)).all()
    assert move.max() <= cfg.max_step + 1e-3, f"sweep moved {move.max()} m"
    # and many sweeps remain finite (each bounded, direction preserved)
    many = bk.optimize(cfg, g_bad, gn_iterations=8)
    assert np.isfinite(np.asarray(many.t)).all()
