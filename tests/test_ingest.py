"""Real-data ingestion: vendor handlers, per-point time recovery, and a
motion-distortion A/B proving real per-point timestamps beat a constant
offset in the undistortion path.

Parity targets: src/jueying_lio/src/pointcloud_preprocess.cc (Oust64Handler
:120-150, LivoxHandler :89-118, VelodyneHandler time synthesis :150-220) and
imu_processing.hpp UndistortPcl (:165-285).
"""

import os

import numpy as np
import jax
import jax.numpy as jnp

from pointcloud_slam_tpu.io import converters, pcd, synthetic
from pointcloud_slam_tpu.models.lio import eskf, imu
from pointcloud_slam_tpu.models.lio import state as st


class TestPointTimes:
    def test_time_field_priority(self):
        n = 10
        cloud = {"x": np.zeros(n), "y": np.zeros(n), "z": np.zeros(n),
                 "time": np.linspace(0.02, 0.08, n)}
        t = converters.point_times_from_cloud(cloud)
        np.testing.assert_allclose(t, np.linspace(0.0, 0.06, n), atol=1e-6)

    def test_t_nanoseconds(self):
        n = 5
        cloud = {"x": np.zeros(n), "y": np.zeros(n), "z": np.zeros(n),
                 "t": np.arange(n, dtype=np.float64) * 1e7}  # 10 ms steps in ns
        t = converters.point_times_from_cloud(cloud)
        np.testing.assert_allclose(t, np.arange(n) * 0.01, atol=1e-6)

    def test_curvature_milliseconds(self):
        n = 5
        cloud = {"x": np.zeros(n), "y": np.zeros(n), "z": np.zeros(n),
                 "curvature": np.arange(n, dtype=np.float64) * 10.0}  # ms
        t = converters.point_times_from_cloud(cloud)
        np.testing.assert_allclose(t, np.arange(n) * 0.01, atol=1e-6)

    def test_fallback_is_ramp_not_constant(self):
        n = 100
        cloud = {"x": np.zeros(n), "y": np.zeros(n), "z": np.zeros(n)}
        t = converters.point_times_from_cloud(cloud, scan_duration=0.1)
        assert t[0] == 0.0 and t[-1] > 0.09 and np.all(np.diff(t) > 0)


class TestVendorHandlers:
    def test_ouster64(self):
        n = 8
        cloud = {"x": np.ones(n), "y": np.zeros(n), "z": np.zeros(n),
                 "intensity": np.arange(n, dtype=np.float64),
                 "ring": np.arange(n) % 4,
                 "t": np.arange(n, dtype=np.float64) * 1.5625e6}  # ns
        out = converters.ouster64_to_xyzirt(cloud)
        np.testing.assert_allclose(out["time"], np.arange(n) * 1.5625e-3, atol=1e-7)
        assert out["ring"].dtype == np.int32

    def test_livox_pc2(self):
        n = 6
        base = 1.7e9
        cloud = {"x": np.ones(n), "y": np.zeros(n), "z": np.zeros(n),
                 "intensity": np.zeros(n), "line": np.arange(n) % 3,
                 "timestamp": base + np.arange(n, dtype=np.float64) * 0.01}
        out = converters.livox_pc2_to_xyzirt(cloud)
        np.testing.assert_allclose(out["time"], np.arange(n) * 0.01, atol=1e-6)

    def test_pcd_roundtrip_with_time(self, tmp_path):
        n = 50
        rng = np.random.default_rng(0)
        pts = rng.standard_normal((n, 3)).astype(np.float32)
        times = np.linspace(0, 0.1, n).astype(np.float32)
        path = os.path.join(tmp_path, "scan.pcd")
        pcd.write_pcd(path, pts, extra_fields={"time": times})
        cloud = pcd.read_pcd(path)
        np.testing.assert_allclose(cloud["time"], times, atol=1e-6)
        t = converters.point_times_from_cloud(cloud)
        np.testing.assert_allclose(t, times, atol=1e-6)


class TestDistortedDeskew:
    """A rotating sensor samples points throughout the sweep; undistortion
    with the TRUE per-point times must beat a constant-offset stand-in."""

    def _setup(self):
        # world points on a ring around the sensor
        rng = np.random.default_rng(3)
        n_pts = 400
        ang = rng.uniform(0, 2 * np.pi, n_pts)
        world = np.stack([5.0 * np.cos(ang), 5.0 * np.sin(ang), rng.uniform(-1, 1, n_pts)], axis=1)

        # pure yaw rotation at 1.5 rad/s, 20 IMU samples over a 0.1 s scan
        M, dt = 20, 0.005
        wz = 1.5
        g = np.asarray([0.0, 0.0, -9.809])
        offs = (np.arange(M) + 1) * dt
        # IMU measurements: gyro = [0,0,wz]; accel must cancel gravity in body
        # frame (body z stays aligned with world z under pure yaw)
        acc = np.tile(-g, (M, 1)).astype(np.float32)
        gyro = np.tile([0.0, 0.0, wz], (M, 1)).astype(np.float32)

        # per-point sample times uniformly through the scan; each point is
        # observed in the body frame at yaw(t) = wz * t
        t_pt = rng.uniform(0.0, M * dt, n_pts).astype(np.float32)
        yaw = wz * t_pt
        ca, sa = np.cos(yaw), np.sin(yaw)
        # body<-world rotation about z by -yaw applied to world points
        bx = ca * world[:, 0] + sa * world[:, 1]
        by = -sa * world[:, 0] + ca * world[:, 1]
        pts_body = np.stack([bx, by, world[:, 2]], axis=0).astype(np.float32)

        # ground truth: all points expressed in the scan-END body frame
        yaw_end = wz * M * dt
        ce, se = np.cos(yaw_end), np.sin(yaw_end)
        gx = ce * world[:, 0] + se * world[:, 1]
        gy = -se * world[:, 0] + ce * world[:, 1]
        gt_end = np.stack([gx, gy, world[:, 2]], axis=0).astype(np.float32)

        # propagate the filter state through the frame's IMU
        x = st.identity(jnp.float32, 9.809)
        P = eskf.init_P()
        Q = eskf.process_noise_cov()
        x_end, P_end, table = imu.propagate(
            x, P, Q, jnp.asarray(acc), jnp.asarray(gyro), jnp.full(M, dt),
            jnp.asarray(offs.astype(np.float32)), jnp.ones(M, bool),
            jnp.ones(()), jnp.zeros(3), jnp.asarray([0.0, 0.0, wz]),
        )
        return pts_body, t_pt, gt_end, table, x_end, M * dt

    def test_true_times_beat_constant(self):
        pts_body, t_pt, gt_end, table, x_end, T = self._setup()
        mask = jnp.ones(pts_body.shape[1], bool)
        out_true = np.asarray(imu.undistort(jnp.asarray(pts_body), jnp.asarray(t_pt), mask, table, x_end))
        out_const = np.asarray(imu.undistort(jnp.asarray(pts_body), jnp.full(pts_body.shape[1], T, np.float32), mask, table, x_end))
        e_true = np.linalg.norm(out_true - gt_end, axis=0).mean()
        e_const = np.linalg.norm(out_const - gt_end, axis=0).mean()
        # constant offset = NO deskew (points stay distorted ~ wz*T*rho/2);
        # true times must recover the geometry to cm level
        assert e_true < 0.05, e_true
        assert e_const > 4 * e_true, (e_const, e_true)


class TestIntegratePoints:
    """integrate_points depth-camera fusion (fusion_lidar_camera.cpp:215-340)."""

    def test_depth_camera_conversion(self):
        # one point straight ahead, one above 12 deg, one NaN, one too deep
        cloud = {
            "x": np.array([1.0, 1.0, np.nan, 1.0], np.float32),
            "y": np.array([0.0, 0.0, 0.0, 0.0], np.float32),
            "z": np.array([0.0, 2.0, 0.0, 9.0], np.float32),
        }
        out = converters.depth_camera_to_velodyne(cloud, np.eye(4), depth_filter=5.0, stamp=1.5)
        # NaN and z>5 dropped
        assert len(out["x"]) == 2
        assert np.all(out["intensity"] == 100.0)
        assert np.all(out["time"] == np.float32(1.5))
        # pitch 0 -> round(0+40)=40 -> RING_MAP_FUSION[40] == 15
        assert out["ring"][0] == 15
        # pitch ~63 deg (> 12) -> ring 51
        assert out["ring"][1] == 51

    def test_depth_camera_extrinsic_column_major(self):
        cloud = {"x": np.array([1.0]), "y": np.array([2.0]), "z": np.array([3.0])}
        # pure translation in the reference's flat column-major layout
        T = np.eye(4)
        T[3, :3] = [10.0, 20.0, 30.0]  # elements 12,13,14 of the flat vector
        out = converters.depth_camera_to_velodyne(cloud, T)
        np.testing.assert_allclose([out["x"][0], out["y"][0], out["z"][0]], [11.0, 22.0, 33.0], rtol=1e-6)

    def test_approximate_time_sync(self):
        sync = converters.ApproximateTimeSync(2, slop=0.05)
        assert sync.add(0, 0.00, "L0") is None           # camera stream empty
        assert sync.add(1, 0.30, "C0") is None           # lidar 0.0 vs 0.3: too far
        got = sync.add(0, 0.29, "L1")                    # matches C0 within slop
        assert got == ("L1", "C0")
        # queues consumed: nothing left to match
        assert sync.add(0, 0.60, "L2") is None

    def test_fuse_lidar_cameras(self):
        lidar = {
            "x": np.array([1.0, 2.0], np.float32), "y": np.zeros(2, np.float32),
            "z": np.zeros(2, np.float32), "intensity": np.array([7.0, 8.0], np.float32),
            "ring": np.array([0, 1], np.int32), "time": np.zeros(2, np.float32),
        }
        cam = {"x": np.array([0.5]), "y": np.array([0.0]), "z": np.array([0.0])}
        fused = converters.fuse_lidar_cameras(lidar, [cam], [np.eye(4)], stamp=0.25)
        assert len(fused["x"]) == 3
        assert fused["intensity"][2] == 100.0
        assert fused["time"][2] == np.float32(0.25)
