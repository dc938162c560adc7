"""LIO-SAM component tests: projection, features, scan2map, ScanContext, backend."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from pointcloud_slam_tpu.geom import se3, so3
from pointcloud_slam_tpu.io import synthetic
from pointcloud_slam_tpu.models import liosam
from pointcloud_slam_tpu.models.liosam import backend, features, projection, scan2map, scancontext


def soa(x):
    return jnp.asarray(np.ascontiguousarray(np.asarray(x).T))


def make_ring_scan(n_scan=16, horizon=360, seed=0):
    """Synthetic spinning-lidar scan of a square room: rows = elevation rings."""
    rng = np.random.default_rng(seed)
    fov_up, fov_down = 15.0, -15.0
    pts = []
    for r in range(n_scan):
        elev = np.radians(fov_down + (fov_up - fov_down) * r / (n_scan - 1))
        for c in range(horizon):
            az = -np.pi + 2 * np.pi * (c + 0.5) / horizon
            d = np.array([np.cos(elev) * np.cos(az), np.cos(elev) * np.sin(az), np.sin(elev)])
            # square room 10x10, sensor at center, walls at +-5
            tx = 5.0 / max(abs(d[0]), 1e-6)
            ty = 5.0 / max(abs(d[1]), 1e-6)
            t = min(tx, ty)
            p = d * t
            if abs(p[2]) < 2.5:  # keep within wall height
                pts.append(p + rng.normal(scale=0.003, size=3))
    return np.asarray(pts, np.float32)


class TestProjection:
    def test_project_shapes_and_counts(self):
        pts = make_ring_scan()
        cfg = projection.ProjectionConfig(n_scan=16, horizon=360)
        img = projection.project(cfg, soa(pts), jnp.ones(len(pts), bool))
        assert img.rng.shape == (16, 360)
        frac = float(jnp.mean(img.valid.astype(jnp.float32)))
        assert frac > 0.5, f"valid fraction {frac}"

    def test_range_values(self):
        pts = np.array([[3.0, 0.0, 0.0], [0.0, 4.0, 0.0]], np.float32)
        cfg = projection.ProjectionConfig(n_scan=4, horizon=360, fov_up_deg=15, fov_down_deg=-15)
        img = projection.project(cfg, soa(pts), jnp.ones(2, bool))
        got = np.asarray(img.rng)
        vals = got[np.isfinite(got) & (got < 1e9)]
        vals = np.sort(vals[vals < 100])
        np.testing.assert_allclose(vals, [3.0, 4.0], atol=1e-5)


class TestFeatures:
    def test_walls_are_surfaces_corners_are_edges(self):
        pts = make_ring_scan()
        pcfg = projection.ProjectionConfig(n_scan=16, horizon=360)
        img = projection.project(pcfg, soa(pts), jnp.ones(len(pts), bool))
        fcfg = features.FeatureConfig()
        f = features.extract(fcfg, img)
        n_edge = int(jnp.sum(f.edge_mask))
        n_surf = int(jnp.sum(f.surf_mask))
        assert n_surf > 500, f"surf {n_surf}"
        assert 0 < n_edge < n_surf, f"edge {n_edge}"
        # edges should concentrate near the 4 room corners (45/135/225/315 deg)
        cols = np.where(np.asarray(f.edge_mask).any(axis=0))[0]
        az = -180 + 360.0 * (cols + 0.5) / 360  # degrees
        corner_dist = np.min(np.abs(az[:, None] - np.array([[-135, -45, 45, 135]])), axis=1)
        assert np.median(corner_dist) < 15.0


class TestScan2Map:
    def test_pose_recovery(self):
        # corner map: vertical poles; surf map: floor + two walls
        rng = np.random.default_rng(0)
        poles = []
        for (px, py) in [(-4, -4), (4, -4), (-4, 4), (4, 4), (0, 4), (4, 0)]:
            z = rng.uniform(0, 3, size=(60, 1))
            poles.append(np.concatenate([np.full((60, 1), float(px)), np.full((60, 1), float(py)), z], axis=1))
        corners = np.concatenate(poles).astype(np.float32) + rng.normal(scale=0.004, size=(360, 3)).astype(np.float32)
        floor = np.concatenate([rng.uniform(-5, 5, size=(1200, 2)), np.zeros((1200, 1))], axis=1)
        wall1 = np.stack([rng.uniform(-5, 5, 800), np.full(800, 5.0), rng.uniform(0, 3, 800)], axis=1)
        wall2 = np.stack([np.full(800, -5.0), rng.uniform(-5, 5, 800), rng.uniform(0, 3, 800)], axis=1)
        surfs = np.concatenate([floor, wall1, wall2]).astype(np.float32)
        surfs += rng.normal(scale=0.004, size=surfs.shape).astype(np.float32)

        cfg = scan2map.Scan2MapConfig()
        corner_map = __import__("pointcloud_slam_tpu").ops.insert(
            cfg.corner_grid, __import__("pointcloud_slam_tpu").ops.create(cfg.corner_grid), soa(corners), jnp.ones(len(corners), bool)
        )
        surf_map = __import__("pointcloud_slam_tpu").ops.insert(
            cfg.surf_grid, __import__("pointcloud_slam_tpu").ops.create(cfg.surf_grid), soa(surfs), jnp.ones(len(surfs), bool)
        )
        R, t = synthetic.random_pose(seed=3, rot_scale=0.03, trans_scale=0.2)
        csrc = ((corners - t) @ R).astype(np.float32)
        ssrc = ((surfs - t) @ R).astype(np.float32)
        res = scan2map.scan_to_map(
            cfg, corner_map, surf_map, soa(csrc), jnp.ones(len(csrc), bool), soa(ssrc), jnp.ones(len(ssrc), bool)
        )
        trans_err = np.linalg.norm(np.asarray(res.pose.t) - t)
        rot_err = np.degrees(np.linalg.norm(np.asarray(so3.log(jnp.asarray(R.T) @ res.pose.R))))
        assert trans_err < 0.05, f"trans {trans_err}"
        assert rot_err < 0.5, f"rot {rot_err}"
        assert int(res.num_surf) > 500

    def test_baked_local_maps_match_unbaked(self):
        """scan2map.baked_grid local maps (one-gather kNN, the product shape
        of run_slam_offline/bench config 6) recover the same pose as the
        unbaked reference layout."""
        import dataclasses as dc

        rng = np.random.default_rng(5)
        poles = []
        for (px, py) in [(-4, -4), (4, -4), (-4, 4), (4, 4), (0, 4)]:
            z = rng.uniform(0, 3, size=(40, 1))
            poles.append(np.concatenate([np.full((40, 1), float(px)), np.full((40, 1), float(py)), z], axis=1))
        corners = np.concatenate(poles).astype(np.float32)
        floor = np.concatenate([rng.uniform(-5, 5, size=(800, 2)), np.zeros((800, 1))], axis=1)
        wall = np.stack([rng.uniform(-5, 5, 600), np.full(600, 5.0), rng.uniform(0, 3, 600)], axis=1)
        surfs = np.concatenate([floor, wall]).astype(np.float32)
        surfs += rng.normal(scale=0.004, size=surfs.shape).astype(np.float32)

        ops_ = __import__("pointcloud_slam_tpu").ops
        R, t = synthetic.random_pose(seed=7, rot_scale=0.03, trans_scale=0.2)
        csrc, ssrc = ((corners - t) @ R).astype(np.float32), ((surfs - t) @ R).astype(np.float32)

        poses = []
        for baked in (False, True):
            cfg = scan2map.Scan2MapConfig()
            if baked:
                cfg = dc.replace(cfg, corner_grid=scan2map.baked_grid(cfg.corner_grid),
                                 surf_grid=scan2map.baked_grid(cfg.surf_grid))
            cmap = ops_.insert(cfg.corner_grid, ops_.create(cfg.corner_grid), soa(corners), jnp.ones(len(corners), bool))
            smap = ops_.insert(cfg.surf_grid, ops_.create(cfg.surf_grid), soa(surfs), jnp.ones(len(surfs), bool))
            res = scan2map.scan_to_map(
                cfg, cmap, smap, soa(csrc), jnp.ones(len(csrc), bool), soa(ssrc), jnp.ones(len(ssrc), bool)
            )
            poses.append(np.asarray(res.pose.t))
            assert np.linalg.norm(poses[-1] - t) < 0.05, f"baked={baked}"
        np.testing.assert_allclose(poses[0], poses[1], atol=5e-3)


class TestScanContext:
    def test_detects_rotated_revisit(self):
        cfg = scancontext.ScanContextConfig(exclude_recent=2)
        cloud = synthetic.make_room_cloud(4000, seed=0)
        q_desc, q_key = scancontext.make_descriptor(cfg, soa(cloud), jnp.ones(len(cloud), bool))
        KF = 64
        descs = jnp.zeros((KF, cfg.num_ring, cfg.num_sector))
        keys = jnp.zeros((KF, cfg.num_ring))
        # store: different places + the same place rotated at slot 3
        for i, seed in enumerate([5, 6, 7]):
            other = synthetic.make_room_cloud(4000, seed=seed) + np.array([50.0 * (i + 1), 0, 0], np.float32)
            d, k = scancontext.make_descriptor(cfg, soa(other), jnp.ones(4000, bool))
            descs = descs.at[i].set(d)
            keys = keys.at[i].set(k)
        yaw_true = 0.8
        Rz = np.asarray(so3.exp(jnp.asarray([0, 0, yaw_true], jnp.float32)))
        rot_cloud = (cloud @ Rz)  # world pts seen from a yaw-rotated sensor: R^T p -> p @ R
        d, k = scancontext.make_descriptor(cfg, soa(rot_cloud), jnp.ones(len(cloud), bool))
        descs = descs.at[3].set(d)
        keys = keys.at[3].set(k)
        n_kf = jnp.asarray(10)  # exclude_recent only blocks the latest few
        res = scancontext.detect(cfg, q_desc, q_key, descs, keys, n_kf)
        assert bool(res.found)
        assert int(res.index) == 3
        # yaw recovered up to sector resolution (6 deg)
        err = abs(((float(res.yaw) - yaw_true + np.pi) % (2 * np.pi)) - np.pi)
        err = min(err, abs(((float(res.yaw) + yaw_true + np.pi) % (2 * np.pi)) - np.pi))
        assert err < 0.2, f"yaw {res.yaw} vs {yaw_true}"

    def test_no_false_positive(self):
        cfg = scancontext.ScanContextConfig(exclude_recent=2)
        cloud = synthetic.make_room_cloud(4000, seed=0)
        q_desc, q_key = scancontext.make_descriptor(cfg, soa(cloud), jnp.ones(len(cloud), bool))
        KF = 16
        descs = jnp.zeros((KF, cfg.num_ring, cfg.num_sector))
        keys = jnp.zeros((KF, cfg.num_ring))
        res = scancontext.detect(cfg, q_desc, q_key, descs, keys, jnp.asarray(8))
        assert not bool(res.found)


class TestBackend:
    def _circle_graph(self, cfg, n=40, drift=0.002):
        """Odometry around a circle with per-step drift; returns (graph, gt)."""
        rng = np.random.default_rng(0)
        gt_R, gt_t = [np.eye(3, dtype=np.float32)], [np.zeros(3, np.float32)]
        step_yaw = 2 * np.pi / n
        step_fwd = 0.5
        for k in range(1, n):
            dR = np.asarray(so3.exp(jnp.asarray([0, 0, step_yaw], jnp.float32)))
            gt_R.append((gt_R[-1] @ dR).astype(np.float32))
            gt_t.append((gt_t[-1] + gt_R[-2] @ np.array([step_fwd, 0, 0], np.float32)).astype(np.float32))
        g = backend.create(cfg)
        est_R, est_t = np.eye(3, dtype=np.float32), np.zeros(3, np.float32)
        for k in range(n):
            if k == 0:
                g = backend.add_keyframe(cfg, g, jnp.asarray(gt_R[0]), jnp.asarray(gt_t[0]))
                continue
            relR = gt_R[k - 1].T @ gt_R[k]
            relt = gt_R[k - 1].T @ (gt_t[k] - gt_t[k - 1])
            # drifted odometry
            noise = np.asarray(so3.exp(jnp.asarray([0, 0, drift], jnp.float32)))
            relR_n = (relR @ noise).astype(np.float32)
            est_R_new = est_R @ relR_n
            est_t_new = est_t + est_R @ relt
            # graph stores the DRIFTED estimate as node init and the drifted rel as factor
            g = backend.add_keyframe(cfg, g, jnp.asarray(est_R_new), jnp.asarray(est_t_new))
            # overwrite the stored measurement with the drifted one (add_keyframe derives it)
            est_R, est_t = est_R_new, est_t_new
        return g, (np.stack(gt_R), np.stack(gt_t))

    def test_loop_closure_corrects_drift(self):
        cfg = backend.BackendConfig(max_keyframes=64, max_loops=8, gn_iterations=8, pcg_iterations=80)
        g, (gt_R, gt_t) = self._circle_graph(cfg, n=40, drift=0.004)
        n = int(g.n)
        drift_before = np.linalg.norm(np.asarray(g.t[n - 1]) - gt_t[-1])
        assert drift_before > 0.05  # drift accumulated
        # loop factor: node n-1 -> node 0 with the TRUE relative pose
        relR = gt_R[-1].T @ gt_R[0]
        relt = gt_R[-1].T @ (gt_t[0] - gt_t[-1])
        # robust=False: this is a trusted ground-truth loop with very high
        # information (1e4); the Cauchy IRLS weight is for fitness-scaled loop
        # factors (variance ~0.5 as in the reference) and would nearly zero a
        # factor whose initial whitened residual is ~50
        g = backend.add_loop(cfg, g, jnp.asarray(n - 1), jnp.asarray(0), jnp.asarray(relR), jnp.asarray(relt), jnp.full(6, 1e4, jnp.float32), robust=False)
        g2 = backend.optimize(cfg, g)
        err_after = np.linalg.norm(np.asarray(g2.t[:n]) - gt_t, axis=1)
        drift_after = err_after[-1]
        assert drift_after < drift_before * 0.35, f"{drift_before} -> {drift_after}"
        assert err_after.mean() < 0.25

    def test_no_loops_no_change(self):
        cfg = backend.BackendConfig(max_keyframes=64, max_loops=8, gn_iterations=3, pcg_iterations=40)
        g, _ = self._circle_graph(cfg, n=20, drift=0.0)
        g2 = backend.optimize(cfg, g)
        n = int(g.n)
        np.testing.assert_allclose(np.asarray(g2.t[:n]), np.asarray(g.t[:n]), atol=1e-2)

    def test_keyframe_gating(self):
        cfg = backend.BackendConfig(max_keyframes=16)
        g = backend.create(cfg)
        g = backend.add_keyframe(cfg, g, jnp.eye(3), jnp.zeros(3))
        assert not bool(backend.should_add_keyframe(cfg, g, jnp.eye(3), jnp.asarray([0.1, 0, 0])))
        assert bool(backend.should_add_keyframe(cfg, g, jnp.eye(3), jnp.asarray([2.0, 0, 0])))


class TestParamServer:
    """ParamServer mapping (utility.h:62-332) -> typed configs."""

    def test_params_from_shipped_yaml(self):
        import os
        from pointcloud_slam_tpu.models.liosam import params as ps
        from pointcloud_slam_tpu.utils import config as cfgio

        root = os.path.join(os.path.dirname(__file__), "..")
        y = cfgio.load_yaml(os.path.join(root, "configs", "slam", "rslidar.yaml"))
        cfg, pcfg, fcfg, info = ps.slam_config_from_params(y)
        assert pcfg.n_scan == 16 and pcfg.horizon == 1800
        assert pcfg.fov_down_deg == -25.0 and abs(pcfg.fov_up_deg - 15.0) < 1e-6
        assert fcfg.edge_threshold == 1.0 and fcfg.surf_threshold == 0.1
        assert cfg.loop_fitness_thresh == 1.2
        assert cfg.rs_radius == 20.0
        assert cfg.backend.keyframe_dist_thresh == 1.0
        assert cfg.scan2map.solver.max_iterations == 30
        assert abs(info["imu"]["gravity"] - 9.80511) < 1e-6
        assert info["extrinsic_trans"][0] == 0.4813
        # nothing in the recognized namespace silently dropped
        assert info["unused"] == [], info["unused"]
        # the config is hashable/usable as a jit static arg
        hash(cfg)

    def test_params_2_variant(self):
        # the localization-deployment variant (reference config/params_2.yaml):
        # LOAM matching over the rslidar topic, same lidar geometry
        import os
        from pointcloud_slam_tpu.models.liosam import params as ps
        from pointcloud_slam_tpu.utils import config as cfgio

        root = os.path.join(os.path.dirname(__file__), "..")
        y = cfgio.load_yaml(os.path.join(root, "configs", "slam", "params_2.yaml"))
        cfg, pcfg, fcfg, info = ps.slam_config_from_params(y)
        assert pcfg.n_scan == 16 and pcfg.horizon == 1800
        assert info["unused"] == [], info["unused"]
        lcfg, tiles = ps.localization_config_from_params(y)
        assert lcfg.method == "loam"
        assert y["jueying_slam"]["pointCloudTopic"] == "/rslidar_points"

    def test_localization_params(self):
        import os
        from pointcloud_slam_tpu.models.liosam import params as ps
        from pointcloud_slam_tpu.utils import config as cfgio

        root = os.path.join(os.path.dirname(__file__), "..")
        y = cfgio.load_yaml(os.path.join(root, "configs", "slam", "rslidar.yaml"))
        cfg, tiles = ps.localization_config_from_params(y)
        assert cfg.method == "ndt"
        assert cfg.ndt.resolution == 0.5
        assert tiles["area_size"] == 50.0 and tiles["margin"] == 100.0
        assert tiles["initial_method"] == "human"
        assert tiles["unused"] == [], tiles["unused"]


class TestChainPreconditioner:
    """Cyclic-reduction block-tridiagonal solve (backend.chain_factor/solve)."""

    def _random_chain(self, n, B=5, seed=0):
        rng = np.random.default_rng(seed)
        # SPD block tridiagonal: D_i = A_i A_i^T + c I, off-diag small couplings
        L = rng.normal(0, 0.3, (n, B, B)).astype(np.float64)
        L[0] = 0.0
        D = np.zeros((n, B, B))
        for i in range(n):
            A = rng.normal(0, 1.0, (B, B))
            D[i] = A @ A.T + 4.0 * np.eye(B)
        return jnp.asarray(D), jnp.asarray(L)

    def test_matches_dense_solve(self):
        for n in (1, 2, 3, 5, 8, 13):
            D, L = self._random_chain(n, seed=n)
            B = D.shape[-1]
            # dense assembly
            M = np.zeros((n * B, n * B))
            for i in range(n):
                M[i * B:(i + 1) * B, i * B:(i + 1) * B] = np.asarray(D[i])
                if i >= 1:
                    M[i * B:(i + 1) * B, (i - 1) * B:i * B] = np.asarray(L[i])
                    M[(i - 1) * B:i * B, i * B:(i + 1) * B] = np.asarray(L[i]).T
            rng = np.random.default_rng(100 + n)
            r = rng.normal(0, 1, (n, B))
            levels, top_inv = backend.chain_factor(D, L)
            x = np.asarray(backend.chain_solve(levels, top_inv, jnp.asarray(r)))
            x_ref = np.linalg.solve(M, r.reshape(-1)).reshape(n, B)
            np.testing.assert_allclose(x, x_ref, rtol=2e-5, atol=2e-7), f"n={n}"

    def test_long_chain_loop_correction_converges(self):
        """A 512-node drifted chain with ONE strong loop: block-Jacobi PCG at
        60 iterations cannot propagate the correction along the chain; the
        chain preconditioner must."""
        cfg = backend.BackendConfig(max_keyframes=512, max_loops=4, gn_iterations=4, pcg_iterations=20)
        g, (gt_R, gt_t) = TestBackend()._circle_graph(cfg, n=500, drift=0.001)
        n = int(g.n)
        relR = gt_R[-1].T @ gt_R[0]
        relt = gt_R[-1].T @ (gt_t[0] - gt_t[-1])
        g = backend.add_loop(cfg, g, jnp.asarray(n - 1), jnp.asarray(0), jnp.asarray(relR),
                             jnp.asarray(relt), jnp.full(6, 1e4, jnp.float32), robust=False)
        err_before = np.linalg.norm(np.asarray(g.t[:n]) - gt_t, axis=1)
        g2 = backend.optimize(cfg, g)
        err = np.linalg.norm(np.asarray(g2.t[:n]) - gt_t, axis=1)
        # the loop correction must propagate the full chain length within 20
        # PCG iterations (impossible under block-Jacobi, which moves it one
        # hop per iteration): endpoint error collapses ...
        assert err[-1] < err_before[-1] * 0.2, f"{err_before[-1]} -> {err[-1]}"
        # ... and the 20-iteration solve matches a 10x-deeper reference solve
        # (solver adequacy — the interior optimum of a single-loop graph is
        # NOT ground truth, so truth error is the wrong yardstick there)
        cfg_deep = dataclasses.replace(cfg, pcg_iterations=200)
        g_deep = backend.optimize(cfg_deep, g)
        dmax = float(np.abs(np.asarray(g2.t[:n]) - np.asarray(g_deep.t[:n])).max())
        assert dmax < 0.05 * err_before[-1], f"20-iter vs 200-iter solve differ by {dmax}"
