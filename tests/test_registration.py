"""NDT / VGICP / GICP recovery tests (forward/backward invariances like the
reference's gicp_test.cpp FORWARD/BACKWARD parameterized suite)."""

import numpy as np
import jax.numpy as jnp
import pytest

from pointcloud_slam_tpu import ops, register
from pointcloud_slam_tpu.geom import se3, so3
from pointcloud_slam_tpu.io import synthetic
from pointcloud_slam_tpu.ops import gaussian_grid as gg


def soa(x):
    return jnp.asarray(np.ascontiguousarray(np.asarray(x).T))


def make_pair(seed=0, n=4000, rot=0.04, trans=0.3):
    world = synthetic.make_room_cloud(n, seed=seed)
    R, t = synthetic.random_pose(seed=seed + 1, rot_scale=rot, trans_scale=trans)
    src = ((world - t) @ R).astype(np.float32)
    return world, src, R, t


def pose_errors(pose, R, t):
    rot_err = np.degrees(np.linalg.norm(np.asarray(so3.log(jnp.asarray(R.T) @ pose.R))))
    trans_err = np.linalg.norm(np.asarray(pose.t) - t)
    return rot_err, trans_err


class TestGaussianVoxelMap:
    def test_stats_match_numpy(self, rng):
        pts = rng.uniform(-4, 4, size=(2000, 3)).astype(np.float32)
        cfg = ops.GridConfig(capacity=1 << 12, resolution=1.0, nearby=7)
        g = gg.build(cfg, soa(pts), jnp.ones(len(pts), bool), mode="ndt", min_points=6)
        # pick a well-populated voxel and compare mean/cov
        vox = np.floor(pts / 1.0).astype(np.int32)
        uniq, counts = np.unique(vox, axis=0, return_counts=True)
        target = uniq[np.argmax(counts)]
        members = pts[np.all(vox == target, axis=1)]
        slot = int(gg.probe(cfg, g, tuple(jnp.asarray([int(v)], jnp.int32) for v in target))[0])
        assert slot >= 0 and bool(g.valid[slot])
        np.testing.assert_allclose(np.asarray(g.mean[:, slot]), members.mean(axis=0), atol=1e-4)
        cov_np = np.cov(members.T, bias=False)
        got = np.asarray(g.cov[:, slot])
        got_full = np.array([[got[0], got[1], got[2]], [got[1], got[3], got[4]], [got[2], got[4], got[5]]])
        # eigenvalue inflation only raises tiny eigenvalues; compare loosely
        np.testing.assert_allclose(got_full, cov_np, atol=np.abs(cov_np).max() * 0.2 + 1e-3)

    def test_min_points_gating(self, rng):
        pts = rng.uniform(0, 0.9, size=(3, 3)).astype(np.float32)  # 3 pts, one voxel
        cfg = ops.GridConfig(capacity=1 << 8, resolution=1.0)
        g = gg.build(cfg, soa(pts), jnp.ones(3, bool), mode="ndt", min_points=6)
        assert int(jnp.sum(g.valid)) == 0


class TestNDT:
    def test_forward_recovery(self):
        world, src, R, t = make_pair(seed=0)
        cfg = register.NDTConfig(resolution=1.0)
        grid_cfg, target = register.ndt.build_target(cfg, soa(world))
        res = register.ndt.align(grid_cfg, target, soa(src), cfg=cfg)
        rot_err, trans_err = pose_errors(res.pose, R, t)
        assert rot_err < 1.0, f"rot {rot_err}"
        assert trans_err < 0.1, f"trans {trans_err}"

    def test_backward_recovery(self):
        world, src, R, t = make_pair(seed=7)
        cfg = register.NDTConfig(resolution=1.0)
        grid_cfg, target = register.ndt.build_target(cfg, soa(src))
        res = register.ndt.align(grid_cfg, target, soa(world), cfg=cfg)
        R_inv, t_inv = R.T, -R.T @ t
        rot_err, trans_err = pose_errors(res.pose, R_inv, t_inv)
        assert rot_err < 1.0
        assert trans_err < 0.1

    def test_baked_target_matches_unbaked(self):
        """gg.bake: the stencil-baked NDT target must produce the SAME
        correspondences, score and pose as the plain map (identical stencil
        and statistics; only the gather layout changes)."""
        world, src, R, t = make_pair(seed=3)
        cfg = register.NDTConfig(resolution=1.0)
        grid_cfg, target = register.ndt.build_target(cfg, soa(world), capacity=1 << 13)
        bcfg, btarget = register.ndt.build_target(cfg, soa(world), capacity=1 << 13, baked=True)
        res_u = register.ndt.align(grid_cfg, target, soa(src), cfg=cfg)
        res_b = register.ndt.align(bcfg, btarget, soa(src), cfg=cfg)
        np.testing.assert_allclose(np.asarray(res_b.pose.t), np.asarray(res_u.pose.t), atol=1e-4)
        np.testing.assert_allclose(np.asarray(res_b.pose.R), np.asarray(res_u.pose.R), atol=1e-4)
        np.testing.assert_allclose(float(res_b.score), float(res_u.score), rtol=1e-3)
        # correspondence-level equality on a fixed query set
        import jax
        pw = jnp.asarray(soa(world)[:, :500])
        mask = jnp.ones(500, bool)
        m_u, i_u, v_u = register.ndt._correspond(cfg, grid_cfg, target, pw, mask)
        m_b, i_b, v_b = register.ndt._correspond_baked(cfg, bcfg, btarget, pw, mask)
        np.testing.assert_array_equal(np.asarray(v_b), np.asarray(v_u))
        np.testing.assert_allclose(
            np.asarray(m_b)[:, np.asarray(v_b)], np.asarray(m_u)[:, np.asarray(v_u)], atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(i_b)[:, np.asarray(v_b)], np.asarray(i_u)[:, np.asarray(v_u)], atol=1e-5
        )

    def test_baked_covers_empty_query_voxels(self):
        """A query in an EMPTY voxel adjacent to occupied ones must still see
        its neighbors (bake creates slots for covered-but-empty voxels)."""
        pts = np.zeros((200, 3), np.float32)
        pts[:, 0] = np.linspace(0.1, 0.9, 200)  # all inside voxel (0,0,0)
        pts[:, 1] = 0.5 + 0.3 * np.sin(np.arange(200))
        pts[:, 2] = 0.5 + 0.3 * np.cos(np.arange(200) * 0.7)
        cfg = register.NDTConfig(resolution=1.0, min_points_per_voxel=6)
        bcfg, btarget = register.ndt.build_target(cfg, soa(pts), capacity=1 << 10, baked=True)
        q = jnp.asarray(np.array([[1.5, 0.5, 0.5]], np.float32).T)  # voxel (1,0,0): empty
        m, i, v = register.ndt._correspond_baked(cfg, bcfg, btarget, q, jnp.ones(1, bool))
        assert int(np.asarray(v).sum()) == 1  # the face neighbor (0,0,0)

    def test_max_eigen_export(self):
        world, src, _, _ = make_pair(seed=1)
        cfg = register.NDTConfig(resolution=1.0)
        grid_cfg, target = register.ndt.build_target(cfg, soa(world))
        res = register.ndt.align(grid_cfg, target, soa(src), cfg=cfg)
        assert float(res.max_eigen) > 0


class TestVGICP:
    def test_forward_recovery(self):
        world, src, R, t = make_pair(seed=2)
        cfg = register.VGICPConfig(resolution=1.0)
        grid_cfg, target = register.vgicp.build_target(cfg, soa(world))
        src_cov = register.source_covariances(soa(src), jnp.ones(src.shape[0], bool), k=cfg.k_correspondences, resolution=cfg.resolution)
        res = register.vgicp.align(grid_cfg, target, soa(src), src_cov, cfg=cfg)
        rot_err, trans_err = pose_errors(res.pose, R, t)
        assert rot_err < 1.0, f"rot {rot_err}"
        assert trans_err < 0.1, f"trans {trans_err}"

    def test_baked_target_matches_unbaked(self):
        """VGICP over a gg.bake'd target must produce the same solve as the
        plain map (identical correspondences/weights, one-gather layout)."""
        world, src, R, t = make_pair(seed=11)
        cfg = register.VGICPConfig(resolution=1.0)
        cov = register.vgicp.source_covariances(soa(src), jnp.ones(len(src), bool), k=cfg.k_correspondences)
        grid_cfg, target = register.vgicp.build_target(cfg, soa(world), capacity=1 << 13)
        bcfg, btarget = register.vgicp.build_target(cfg, soa(world), capacity=1 << 13, baked=True)
        res_u = register.vgicp.align(grid_cfg, target, soa(src), cov, cfg=cfg)
        res_b = register.vgicp.align(bcfg, btarget, soa(src), cov, cfg=cfg)
        np.testing.assert_allclose(np.asarray(res_b.pose.t), np.asarray(res_u.pose.t), atol=1e-4)
        np.testing.assert_allclose(np.asarray(res_b.pose.R), np.asarray(res_u.pose.R), atol=1e-4)
        np.testing.assert_allclose(float(res_b.error), float(res_u.error), rtol=1e-3)

    def test_weight_uses_voxel_count(self):
        # smoke: error decreases from init
        world, src, R, t = make_pair(seed=3)
        cfg = register.VGICPConfig(resolution=1.0, solver=register.SolverConfig(max_iterations=2))
        grid_cfg, target = register.vgicp.build_target(cfg, soa(world))
        src_cov = register.source_covariances(soa(src), jnp.ones(src.shape[0], bool))
        res = register.vgicp.align(grid_cfg, target, soa(src), src_cov, cfg=cfg)
        assert np.isfinite(float(res.error))


class TestGICP:
    def test_forward_recovery(self):
        world, src, R, t = make_pair(seed=4, n=3000)
        cfg = register.GICPConfig()
        grid_cfg, grid, att = register.gicp.build_target(cfg, soa(world))
        src_cov = register.source_covariances(soa(src), jnp.ones(src.shape[0], bool), k=cfg.k_correspondences, resolution=cfg.cov_resolution)
        res = register.gicp.align(grid_cfg, grid, att, soa(src), src_cov, cfg=cfg)
        rot_err, trans_err = pose_errors(res.pose, R, t)
        assert rot_err < 1.0, f"rot {rot_err}"
        assert trans_err < 0.1, f"trans {trans_err}"

    def test_swap_source_target(self):
        world, src, R, t = make_pair(seed=5, n=3000)
        cfg = register.GICPConfig()
        grid_cfg, grid, att = register.gicp.build_target(cfg, soa(src))
        w_cov = register.source_covariances(soa(world), jnp.ones(world.shape[0], bool))
        res = register.gicp.align(grid_cfg, grid, att, soa(world), w_cov, cfg=cfg)
        R_inv, t_inv = R.T, -R.T @ t
        rot_err, trans_err = pose_errors(res.pose, R_inv, t_inv)
        assert rot_err < 1.0
        assert trans_err < 0.1


class TestNDTD2D:
    def test_forward_recovery(self):
        world, src, R, t = make_pair(seed=9)
        cfg = register.NDTConfig(resolution=1.0)
        grid_cfg, target = register.ndt.build_target(cfg, soa(world))
        sm, sc, sv, _cnt = register.ndt.voxelize_source(cfg, soa(src))
        res = register.ndt.align_d2d(grid_cfg, target, sm, sc, sv, cfg=cfg)
        rot_err, trans_err = pose_errors(res.pose, R, t)
        assert rot_err < 1.5, f"rot {rot_err}"
        assert trans_err < 0.15, f"trans {trans_err}"

    def test_baked_matches_unbaked(self):
        world, src, R, t = make_pair(seed=10)
        cfg = register.NDTConfig(resolution=1.0)
        grid_cfg, target = register.ndt.build_target(cfg, soa(world), capacity=1 << 13)
        bcfg, btarget = register.ndt.build_target(cfg, soa(world), capacity=1 << 13, baked=True)
        sm, sc, sv, _cnt = register.ndt.voxelize_source(cfg, soa(src))
        res_u = register.ndt.align_d2d(grid_cfg, target, sm, sc, sv, cfg=cfg)
        res_b = register.ndt.align_d2d(bcfg, btarget, sm, sc, sv, cfg=cfg)
        np.testing.assert_allclose(np.asarray(res_b.pose.t), np.asarray(res_u.pose.t), atol=1e-4)
        np.testing.assert_allclose(np.asarray(res_b.pose.R), np.asarray(res_u.pose.R), atol=1e-4)


class TestRBFCovariances:
    def test_rbf_matches_knn_covariances_in_alignment(self):
        """RBF-kernel covariance estimation (covariance_estimation_rbf.cu
        role): VGICP with RBF source covariances must recover the same pose
        as the k-NN covariance path."""
        import numpy as np
        from pointcloud_slam_tpu import register
        from pointcloud_slam_tpu.io import synthetic

        world = synthetic.make_room_cloud(12_000, seed=7)
        R, t = synthetic.random_pose(seed=8, rot_scale=0.04, trans_scale=0.2)
        src = ((world[:6000] - t) @ R).astype(np.float32).T
        src_j = jnp.asarray(np.ascontiguousarray(src))
        mask = jnp.ones(src_j.shape[1], bool)

        cfg = register.VGICPConfig(resolution=0.8)
        grid_cfg, target = register.vgicp.build_target(cfg, jnp.asarray(world.T))

        cov_knn = register.source_covariances(src_j, mask, k=8, resolution=0.8)
        cov_rbf = register.source_covariances_rbf(src_j, mask, resolution=0.8, kernel_width=0.4)

        r1 = register.vgicp.align(grid_cfg, target, src_j, cov_knn, mask, cfg=cfg)
        r2 = register.vgicp.align(grid_cfg, target, src_j, cov_rbf, mask, cfg=cfg)
        e1 = float(np.linalg.norm(np.asarray(r1.pose.t) - t))
        e2 = float(np.linalg.norm(np.asarray(r2.pose.t) - t))
        # voxelized D2D on this sparse synthetic converges to ~voxel/8 — the
        # point is that BOTH covariance modes land in the same basin around
        # the true pose (the reference's RBF mode is likewise an
        # approximation of the k-NN covariances, not bit-equal to them)
        assert e1 < 0.15 and e2 < 0.15, (e1, e2)


class TestExactCovariances:
    def test_exact_matches_numpy_brute_force(self, rng):
        """source_covariances(method='exact') — the Pallas brute_force_knn.cu
        counterpart — must reproduce a numpy exact-kNN covariance oracle."""
        pts = rng.uniform(-4, 4, size=(600, 3)).astype(np.float32)
        k = 8
        pj = jnp.asarray(pts.T)
        mask = jnp.ones(600, bool)
        got = np.asarray(register.source_covariances(pj, mask, k=k, method="exact"))

        d2 = np.sum((pts[:, None, :] - pts[None, :, :]) ** 2, axis=-1)
        nn = np.argsort(d2, axis=1)[:, :k]
        for i in rng.choice(600, 40, replace=False):
            nb = pts[nn[i]]
            c = np.cov(nb.T, bias=True)
            vals, vecs = np.linalg.eigh(c)
            reg = vecs @ np.diag([1e-3 * vals[2], vals[2], vals[2]]) @ vecs.T
            want = reg[np.triu_indices(3)]
            np.testing.assert_allclose(got[:, i], want, rtol=2e-2, atol=2e-4)

    def test_exact_mode_aligns(self):
        world = synthetic.make_room_cloud(12_000, seed=9)
        R, t = synthetic.random_pose(seed=10, rot_scale=0.04, trans_scale=0.2)
        src = ((world[:6000] - t) @ R).astype(np.float32).T
        src_j = jnp.asarray(np.ascontiguousarray(src))
        mask = jnp.ones(src_j.shape[1], bool)
        cfg = register.VGICPConfig(resolution=0.8)
        grid_cfg, target = register.vgicp.build_target(cfg, jnp.asarray(world.T))
        # k=20 is the reference default (fast_gicp.hpp k_correspondences_);
        # unbounded exact-kNN neighborhoods need the larger k for stable
        # normals on sparse synthetic clouds (k=8 lands at ~0.25 m here)
        cov = register.source_covariances(src_j, mask, k=20, method="exact")
        r = register.vgicp.align(grid_cfg, target, src_j, cov, mask, cfg=cfg)
        e = float(np.linalg.norm(np.asarray(r.pose.t) - t))
        assert e < 0.15, e


class TestBakeOverflow:
    def test_undersized_baked_capacity_warns(self):
        import warnings

        world = synthetic.make_room_cloud(8000, seed=2)
        cfg = register.NDTConfig(resolution=0.5)
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            register.ndt.build_target(cfg, soa(world), capacity=1 << 12,
                                      baked=True, baked_capacity=1 << 6)
        assert any("dropped" in str(x.message) for x in w), \
            "capacity overflow must be surfaced, not silent"
