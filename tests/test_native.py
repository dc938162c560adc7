"""C++ oracle parity tests: TPU kernels vs the native reference implementations."""

import numpy as np
import jax.numpy as jnp
import pytest

from pointcloud_slam_tpu import native, ops, register
from pointcloud_slam_tpu.geom import fit, so3
from pointcloud_slam_tpu.io import synthetic


def soa(x):
    return jnp.asarray(np.ascontiguousarray(np.asarray(x).T))


class TestOracleParity:
    def test_plane_fit_matches_oracle(self, rng):
        for seed in range(8):
            r = np.random.default_rng(seed)
            pts = r.normal(size=(5, 3))
            pts[:, 2] = pts[:, :2] @ [0.1, -0.2] + 1.5 + r.normal(scale=0.01, size=5)
            coef_o, ok_o = native.esti_plane(pts, threshold=0.1)
            coef_j, ok_j = fit.plane_fit(
                jnp.asarray(pts.T[:, :, None], jnp.float32), jnp.ones((5, 1), bool), 0.1, 3
            )
            assert bool(ok_j[0]) == ok_o
            if ok_o:
                cj = np.asarray(coef_j[:, 0])
                sign = np.sign(cj[:3] @ coef_o[:3])
                np.testing.assert_allclose(cj, sign * coef_o, atol=5e-4)

    def test_knn_matches_oracle(self, rng):
        db = rng.uniform(-3, 3, size=(400, 3)).astype(np.float32)
        q = rng.uniform(-2, 2, size=(50, 3)).astype(np.float32)
        cfg = ops.GridConfig(capacity=1 << 12, pts_per_voxel=32, resolution=1.5, nearby=27)
        grid = ops.insert(cfg, ops.create(cfg), soa(db), jnp.ones(len(db), bool))
        _, d2_j, cnt, _ = ops.knn(cfg, grid, soa(q), k=5, max_range=1.5)
        idx_o, d2_o = native.knn(db, q, 5, max_range=1.5)
        d2_j = np.sort(np.asarray(d2_j).T, axis=1)
        for i in range(len(q)):
            # oracle searches the full cloud; the grid searches the 27-stencil.
            # with resolution 1.5 > max_range 1.5... stencil covers it: compare.
            got = d2_j[i][np.isfinite(d2_j[i]) & (d2_j[i] < 1e30)]
            want = d2_o[i][d2_o[i] < 1e30]
            np.testing.assert_allclose(got, want[: len(got)], rtol=1e-4, atol=1e-5)
            assert len(got) == len(want)

    def test_icp_matches_oracle(self):
        world = synthetic.make_room_cloud(1500, seed=3)
        R, t = synthetic.random_pose(seed=4, rot_scale=0.03, trans_scale=0.15)
        src = ((world - t) @ R).astype(np.float32)
        R_o, t_o, ok = native.icp_point_to_plane(world, src, iters=30, max_corr=5.0)
        assert ok
        # oracle must recover the truth
        assert np.linalg.norm(t_o - t) < 0.05
        # and the TPU ICP must land within tolerance of the oracle
        grid_cfg = ops.GridConfig(capacity=1 << 14, pts_per_voxel=16, resolution=0.5, nearby=7)
        _, grid = register.build_target_map(soa(world), grid_cfg=grid_cfg)
        res = register.point_to_plane_icp(grid_cfg, grid, soa(src))
        np.testing.assert_allclose(np.asarray(res.pose.t), t_o, atol=0.03)
        rot_err = np.degrees(np.linalg.norm(np.asarray(so3.log(jnp.asarray(R_o.T, jnp.float32) @ res.pose.R))))
        assert rot_err < 0.5

    def test_eigh3_matches(self, rng):
        A = rng.normal(size=(3, 3))
        A = A + A.T
        a6 = np.array([A[0, 0], A[0, 1], A[0, 2], A[1, 1], A[1, 2], A[2, 2]])
        want = np.linalg.eigvalsh(A)
        got = native.eigh3(a6)
        np.testing.assert_allclose(got, want, atol=1e-9)


class TestIngestShim:
    def test_frame_assembly(self):
        shim = native.IngestShim(n_points=128, n_imu=16)
        t_imu = np.arange(0.0, 0.3, 0.01)
        shim.push_imu(t_imu, np.tile([0, 0, 9.8], (len(t_imu), 1)).astype(np.float32),
                      np.zeros((len(t_imu), 3), np.float32))
        xyz = np.random.default_rng(0).uniform(-5, 5, (100, 3)).astype(np.float32)
        t_pts = np.linspace(0.1, 0.2, 100)
        fr = shim.make_frame(xyz, t_pts, 0.1, 0.2, blind=0.5, filter_num=1)
        assert fr is not None
        assert fr["pt_mask"].sum() > 50  # some dropped by blind range
        assert fr["imu_mask"].sum() == 10  # samples in (0.1, 0.2]
        # offs relative to scan start, padding large
        offs = fr["imu_offs"]
        assert offs[fr["imu_mask"]].max() <= 0.100001
        assert (offs[~fr["imu_mask"]] > 1e8).all()
        np.testing.assert_allclose(fr["imu_dt"][fr["imu_mask"]], 0.01, atol=1e-6)

    def test_imu_gate(self):
        shim = native.IngestShim(n_points=32, n_imu=8)
        shim.push_imu(np.array([0.05]), np.zeros((1, 3), np.float32), np.zeros((1, 3), np.float32))
        fr = shim.make_frame(np.ones((10, 3), np.float32), np.full(10, 0.15), 0.1, 0.2)
        assert fr is None  # IMU does not cover scan end yet

    def test_decimation(self):
        shim = native.IngestShim(n_points=64, n_imu=8)
        shim.push_imu(np.array([0.25]), np.zeros((1, 3), np.float32), np.zeros((1, 3), np.float32))
        xyz = np.tile(np.array([[2.0, 0, 0]], np.float32), (30, 1))
        fr = shim.make_frame(xyz, np.full(30, 0.15), 0.1, 0.2, filter_num=3)
        assert fr["pt_mask"].sum() == 10


class TestLiveDriverShim:
    def test_live_replay_matches_offline_assembly(self):
        """The threaded live driver must deliver the same frames the offline
        IngestShim assembles from the same data (the livox_ros_driver ->
        SyncPackages pipeline vs the offline replay path)."""
        rng = np.random.default_rng(5)
        n_frames, NP, NI = 6, 128, 16
        frame_dt = 0.1
        scans = []
        for f in range(n_frames):
            xyz = rng.uniform(-5, 5, (100, 3)).astype(np.float32)
            t0 = f * frame_dt
            t_pts = np.linspace(t0, t0 + frame_dt, 100, endpoint=False)
            scans.append((xyz, t_pts, t0, t0 + frame_dt))
        t_imu = np.arange(0.0, n_frames * frame_dt + 0.05, 0.01)
        acc = rng.normal(0, 1, (len(t_imu), 3)).astype(np.float32)
        gyro = rng.normal(0, 0.1, (len(t_imu), 3)).astype(np.float32)

        # offline reference assembly
        ref = native.IngestShim(n_points=NP, n_imu=NI)
        ref.push_imu(t_imu, acc, gyro)
        ref_frames = [ref.make_frame(x, tp, t0, t1, blind=0.5) for x, tp, t0, t1 in scans]
        assert all(fr is not None for fr in ref_frames)

        # live replay at 20x real time
        drv = native.LiveDriverShim(n_points=NP, n_imu=NI, time_scale=0.05, blind=0.5)
        for x, tp, t0, t1 in scans:
            drv.load_scan(x, tp, t0, t1)
        drv.load_imu(t_imu, acc, gyro)
        drv.run()
        live_frames = []
        while True:
            fr = drv.pop_frame(timeout_ms=3000)
            if fr is False:
                break
            assert fr is not None, "live driver timed out"
            live_frames.append(fr)
        assert len(live_frames) == n_frames
        for ref_fr, live_fr in zip(ref_frames, live_frames):
            assert live_fr["n_valid"] == ref_fr["n_valid"]
            for key in ("pts", "pt_mask", "t_offs", "imu_acc", "imu_gyro",
                        "imu_dt", "imu_offs", "imu_mask"):
                np.testing.assert_array_equal(live_fr[key], ref_fr[key], err_msg=key)

    def test_live_sync_gate_waits_for_imu(self):
        """A sweep whose IMU lags must still be delivered once the IMU thread
        catches up — the SyncPackages retry gate under real concurrency."""
        drv = native.LiveDriverShim(n_points=32, n_imu=8, time_scale=0.02)
        xyz = np.tile(np.array([[2.0, 0, 0]], np.float32), (10, 1))
        drv.load_scan(xyz, np.full(10, 0.05), 0.0, 0.1)
        # IMU stamps end AFTER the sweep: the lidar thread will initially see
        # uncovered IMU and must retry
        t_imu = np.array([0.02, 0.06, 0.11, 0.15])
        drv.load_imu(t_imu, np.zeros((4, 3), np.float32), np.zeros((4, 3), np.float32))
        drv.run()
        fr = drv.pop_frame(timeout_ms=3000)
        assert fr is not False and fr is not None
        assert fr["n_valid"] == 10
