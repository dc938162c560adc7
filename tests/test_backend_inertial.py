"""Pose-graph backend with (pose, vel, bias) nodes: IMU + GPS + robust loops.

Parity targets: the reference's imuPreintegration factor graph
(src/jueying_slam/src/imuPreintegration.cpp:243-438), addGPSFactor
(src/jueying_slam/src/mapOptmization.cpp:1678-1754) and the Cauchy-robust
SC loop noise (mapOptmization.cpp:822-835).
"""

import numpy as np
import jax.numpy as jnp

from pointcloud_slam_tpu.models.liosam import backend as bk
from pointcloud_slam_tpu.models.lio import preintegration as pim

G = 9.81
CFG = bk.BackendConfig(max_keyframes=16, max_loops=4, gn_iterations=12, pcg_iterations=100)


def _accel_truth(n_kf=8, per_kf=20, dt=0.01, a=0.4):
    """Constant world acceleration along +x, no rotation. Returns per-keyframe
    (pos, vel) ground truth and the raw IMU samples of each inter-kf gap."""
    T = per_kf * dt
    ts = np.arange(n_kf) * T
    pos = np.stack([0.5 * a * ts**2, np.zeros_like(ts), np.zeros_like(ts)], axis=1)
    vel = np.stack([a * ts, np.zeros_like(ts), np.zeros_like(ts)], axis=1)
    acc_body = np.tile(np.asarray([a, 0.0, G], np.float32), (per_kf, 1))  # a - g, R = I
    gyro = np.zeros((per_kf, 3), np.float32)
    return pos.astype(np.float32), vel.astype(np.float32), acc_body, gyro, dt, T


def _build(with_imu, odom_scale, n_kf=8, gps_every=0, gps_info=0.0):
    pos, vel, acc, gyro, dt, T = _accel_truth(n_kf=n_kf)
    g = bk.create(CFG)
    # distorted odometry chain: measured translation deltas scaled by odom_scale
    est = np.zeros((n_kf, 3), np.float32)
    for k in range(1, n_kf):
        est[k] = est[k - 1] + (pos[k] - pos[k - 1]) * odom_scale
    for k in range(n_kf):
        p = None
        if with_imu and k > 0:
            p = pim.preintegrate(
                jnp.asarray(acc), jnp.asarray(gyro), jnp.full(acc.shape[0], dt),
                jnp.ones(acc.shape[0], bool), jnp.zeros(3), jnp.zeros(3),
            )
        g = bk.add_keyframe(
            CFG, g, jnp.eye(3), jnp.asarray(est[k]),
            odom_info_diag=jnp.full((6,), 1e2),
            vel_new=jnp.asarray(vel[k] * odom_scale),
            pim=p,
            imu_info_diag=jnp.concatenate([jnp.full((3,), 1e6), jnp.full((3,), 1e6), jnp.full((3,), 1e6)]),
        )
        if gps_every and (k % gps_every == 0):
            g = bk.add_gps(g, jnp.asarray(k), jnp.asarray(pos[k]), jnp.full((3,), gps_info))
    return g, pos


class TestInertialBackend:
    def test_imu_factor_reduces_error(self):
        # odometry measurements 25% long; IMU factors carry the true motion
        g0, pos = _build(with_imu=False, odom_scale=1.25)
        g1, _ = _build(with_imu=True, odom_scale=1.25)
        s0 = bk.optimize(CFG, g0)
        s1 = bk.optimize(CFG, g1)
        n = pos.shape[0]
        e0 = float(np.linalg.norm(np.asarray(s0.t)[:n] - pos, axis=1).max())
        e1 = float(np.linalg.norm(np.asarray(s1.t)[:n] - pos, axis=1).max())
        # odom-only stays on the distorted chain; IMU pulls it to the truth
        assert e0 > 0.02
        assert e1 < 0.5 * e0 and e1 < 0.05, (e0, e1)

    def test_imu_velocity_estimated(self):
        g1, pos = _build(with_imu=True, odom_scale=1.25)
        s1 = bk.optimize(CFG, g1)
        _, vel, *_ = _accel_truth()
        n = pos.shape[0]
        ev = float(np.linalg.norm(np.asarray(s1.vel)[:n] - vel / 1.25 * 1.0, axis=1).mean())
        # velocities should land near the true profile (loose gate)
        true_err = float(np.linalg.norm(np.asarray(s1.vel)[:n] - vel, axis=1).mean())
        assert true_err < 0.2, true_err

    def test_gps_pulls_drift(self):
        g0, pos = _build(with_imu=False, odom_scale=1.3)
        g2, _ = _build(with_imu=False, odom_scale=1.3, gps_every=2, gps_info=1e4)
        s0 = bk.optimize(CFG, g0)
        s2 = bk.optimize(CFG, g2)
        n = pos.shape[0]
        e0 = float(np.linalg.norm(np.asarray(s0.t)[:n] - pos, axis=1).max())
        e2 = float(np.linalg.norm(np.asarray(s2.t)[:n] - pos, axis=1).max())
        assert e2 < 0.3 * e0, (e0, e2)

    def test_odom_only_unchanged(self):
        # without IMU/GPS the solve must reproduce the odometry chain exactly
        g0, pos = _build(with_imu=False, odom_scale=1.0)
        s0 = bk.optimize(CFG, g0)
        n = pos.shape[0]
        np.testing.assert_allclose(np.asarray(s0.t)[:n], pos, atol=1e-3)

    def test_false_loop_robust_rejected(self):
        # consistent odometry + one wildly wrong loop factor with the Cauchy
        # kernel: the graph must survive (reference mapOptmization.cpp:822-835)
        g0, pos = _build(with_imu=False, odom_scale=1.0)
        bad_t = jnp.asarray([5.0, 5.0, 0.0])
        g_rob = bk.add_loop(CFG, g0, jnp.asarray(1), jnp.asarray(6), jnp.eye(3), bad_t,
                            jnp.full((6,), 30.0), robust=True)
        s_rob = bk.optimize(CFG, g_rob)
        n = pos.shape[0]
        e_rob = float(np.linalg.norm(np.asarray(s_rob.t)[:n] - pos, axis=1).max())
        assert e_rob < 0.25, e_rob

        g_naive = bk.add_loop(CFG, g0, jnp.asarray(1), jnp.asarray(6), jnp.eye(3), bad_t,
                              jnp.full((6,), 30.0), robust=False)
        s_nv = bk.optimize(CFG, g_naive)
        e_nv = float(np.linalg.norm(np.asarray(s_nv.t)[:n] - pos, axis=1).max())
        # the unguarded graph is visibly corrupted; the robust one is not
        assert e_nv > 4 * e_rob, (e_nv, e_rob)


class TestWindowOptimize:
    """optimize_window: the iSAM2 per-keyframe update role
    (mapOptmization.cpp:1835-1850) — O(window) incremental solve."""

    def test_window_corrects_recent_only(self):
        KF = 64
        cfg = bk.BackendConfig(max_keyframes=KF, max_loops=4)
        rng = np.random.default_rng(2)
        t_true = np.cumsum(np.tile([0.5, 0.0, 0.0], (40, 1)), 0).astype(np.float32)
        g = bk.create(cfg)
        for k in range(40):
            g = bk.add_keyframe(cfg, g, jnp.eye(3), jnp.asarray(t_true[k]))
        # perturb the ESTIMATES of recent nodes after the fact (measurements
        # stay truth-consistent) — the window solve must pull them back
        noise = np.zeros((KF, 3), np.float32)
        noise[30:40] = rng.normal(0, 0.05, (10, 3)).astype(np.float32)
        g = g._replace(t=g.t + jnp.asarray(noise))
        before = np.asarray(g.t)[:40]
        solved = bk.optimize_window(cfg, g, window=16)
        after = np.asarray(solved.t)[:40]
        # nodes before the window are untouched
        np.testing.assert_array_equal(after[:24], before[:24])
        # recent-node error is reduced
        e_before = np.linalg.norm(before[30:] - t_true[30:], axis=1).max()
        e_after = np.linalg.norm(after[30:] - t_true[30:], axis=1).max()
        assert e_after < 0.2 * e_before, (e_before, e_after)

    def test_window_uses_in_window_loop(self):
        KF = 32
        cfg = bk.BackendConfig(max_keyframes=KF, max_loops=4)
        rng = np.random.default_rng(3)
        t_true = np.cumsum(np.tile([0.4, 0.0, 0.0], (20, 1)), 0).astype(np.float32)
        g = bk.create(cfg)
        for k in range(20):
            drift = np.array([0.0, 0.02 * max(0, k - 8), 0.0], np.float32)
            g = bk.add_keyframe(cfg, g, jnp.eye(3), jnp.asarray(t_true[k] + drift))
        # in-window loop between nodes 10 and 19 pulling the drift out
        g = bk.add_loop(cfg, g, jnp.asarray(10), jnp.asarray(19), jnp.eye(3),
                        jnp.asarray(t_true[19] - t_true[10]), jnp.full((6,), 1e5), robust=False)
        solved = bk.optimize_window(cfg, g, window=16, pcg_iterations=24)
        rel = np.asarray(solved.t[19] - solved.t[10])
        np.testing.assert_allclose(rel, t_true[19] - t_true[10], atol=0.05)

    def test_residual_stats_decrease(self):
        g0, pos = _build(with_imu=False, odom_scale=1.0)
        chi0, rms0 = (float(np.asarray(v)) for v in bk.residual_stats(CFG, g0))
        solved = bk.optimize(CFG, g0)
        chi1, rms1 = (float(np.asarray(v)) for v in bk.residual_stats(CFG, solved))
        assert chi1 <= chi0 + 1e-6
