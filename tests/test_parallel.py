"""Sharded registration must match the single-device result on the 8-CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp

from pointcloud_slam_tpu import ops, parallel, register
from pointcloud_slam_tpu.geom import se3
from pointcloud_slam_tpu.io import synthetic

GRID = ops.GridConfig(capacity=1 << 13, pts_per_voxel=16, resolution=0.5, nearby=7)


def test_mesh_has_8_devices():
    mesh = parallel.make_mesh()
    assert mesh.devices.size == 8


def test_sharded_icp_matches_single_device():
    mesh = parallel.make_mesh()
    world = synthetic.make_room_cloud(2048, seed=0)
    grid_cfg, grid = register.build_target_map(jnp.asarray(world.T), grid_cfg=GRID)

    B = mesh.shape["dp"] * 2
    srcs, poses_R, poses_t = [], [], []
    for b in range(B):
        R, t = synthetic.random_pose(seed=10 + b, rot_scale=0.05, trans_scale=0.2)
        srcs.append((world - t) @ R)
        poses_R.append(R)
        poses_t.append(t)
    src = jnp.asarray(np.stack(srcs).transpose(0, 2, 1), jnp.float32)  # (B, 3, N)
    mask = jnp.ones((src.shape[0], src.shape[2]), bool)
    init = se3.identity(batch=(B,))

    pose, conv, iters = parallel.sharded_point_to_plane_icp(mesh, grid_cfg, grid, src, mask, init)
    # compare against the unsharded solver per problem
    for b in range(B):
        ref = register.point_to_plane_icp(grid_cfg, grid, src[b])
        # the sharded solver re-searches every iteration while the single-device
        # path caches correspondences -> small differences at convergence
        np.testing.assert_allclose(np.asarray(pose.t[b]), np.asarray(ref.pose.t), atol=1e-2)
        np.testing.assert_allclose(np.asarray(pose.R[b]), np.asarray(ref.pose.R), atol=1e-2)
        # and against ground truth
        np.testing.assert_allclose(np.asarray(pose.t[b]), poses_t[b], atol=5e-2)


def test_sharded_lio_update_matches_single_device():
    """Point-axis sharded iterated ESKF == single-device update (the LIO
    frame step's SP analogue: per-point search/fit/Jacobian work sharded,
    HTH/HTh psum'd inside every iteration)."""
    from pointcloud_slam_tpu.models import lio
    from pointcloud_slam_tpu.models.lio import eskf
    from pointcloud_slam_tpu.models.lio import pipeline as lp
    from pointcloud_slam_tpu.io import synthetic

    cfg = lio.LIOConfig(grid=GRID, init_imu_frames=1)
    world = synthetic.make_room_cloud(4096, seed=0)
    _, grid = register.build_target_map(jnp.asarray(world.T), grid_cfg=GRID)

    # scan observed from a slightly wrong state -> the update must correct it
    rng = np.random.default_rng(3)
    sel = rng.choice(len(world), 1024, replace=False)
    pts_body = jnp.asarray((world[sel] - np.array([0.1, -0.05, 0.02])).T, jnp.float32)
    mask = jnp.ones(1024, bool)

    s0 = lio.create_state(cfg)
    x0, P0 = s0.x, s0.P

    body_norm = jnp.sqrt(jnp.sum(pts_body * pts_body, axis=0))
    tbl = ops.knn_table(cfg.grid, grid)
    obs = lp._obs_model(cfg, grid, pts_body, body_norm, mask, tbl=tbl)
    ref = eskf.update_iterated(x0, P0, obs, cfg.laser_point_cov, cfg.max_iterations, cfg.epsi)

    mesh = parallel.make_mesh(8)
    x_sh, P_sh, iters, conv = parallel.sharded_lio_update(mesh, cfg, grid, x0, P0, pts_body, mask)
    np.testing.assert_allclose(np.asarray(x_sh.pos), np.asarray(ref.x.pos), atol=1e-5)
    np.testing.assert_allclose(np.asarray(x_sh.rot), np.asarray(ref.x.rot), atol=1e-5)
    np.testing.assert_allclose(np.asarray(P_sh), np.asarray(ref.P), atol=1e-5)
    assert int(iters) == int(ref.iterations)


def test_sharded_scan_to_map_matches_single_device():
    """Point-axis sharded LOAM scan-to-map == single-device solve (the SLAM
    front end's SP analogue: corner/surf search+fit+rows sharded, 6x6 H / b
    psum'd at every linearization)."""
    from pointcloud_slam_tpu.models.liosam import scan2map as s2m

    cfg = s2m.Scan2MapConfig()
    corners_w, surfs_w = synthetic.make_feature_world(seed=4)
    R = np.eye(3, dtype=np.float32)
    t = np.array([0.5, 0.2, 1.0], np.float32)
    soa = lambda x: jnp.asarray(np.ascontiguousarray(np.asarray(x).T))
    # dense map (the matching scans below stay at the sharded sizes)
    c, cm = synthetic.take_scan(corners_w, R, t, 1024, seed=1)
    s, sm = synthetic.take_scan(surfs_w, R, t, 8192, seed=2)
    cmap = ops.insert(cfg.corner_grid, ops.create(cfg.corner_grid, jnp.float32), soa(c + t), jnp.asarray(cm))
    smap = ops.insert(cfg.surf_grid, ops.create(cfg.surf_grid, jnp.float32), soa(s + t), jnp.asarray(sm))
    # new scan from a nearby pose, solved from an offset init
    t2 = t + np.array([0.15, -0.1, 0.03], np.float32)
    c2, cm2 = synthetic.take_scan(corners_w, R, t2, 256, seed=3)
    s2_, sm2 = synthetic.take_scan(surfs_w, R, t2, 1024, seed=4)
    init = se3.Pose(jnp.eye(3), jnp.asarray(t))

    ref = s2m.scan_to_map(cfg, cmap, smap, soa(c2), jnp.asarray(cm2), soa(s2_), jnp.asarray(sm2), init)
    mesh = parallel.make_mesh(8)
    sh = parallel.sharded_scan_to_map(mesh, cfg, cmap, smap, soa(c2), jnp.asarray(cm2),
                                      soa(s2_), jnp.asarray(sm2), init)
    np.testing.assert_allclose(np.asarray(sh.pose.t), np.asarray(ref.pose.t), atol=1e-4)
    np.testing.assert_allclose(np.asarray(sh.pose.R), np.asarray(ref.pose.R), atol=1e-4)
    assert int(sh.num_surf) == int(ref.num_surf)
    assert int(sh.num_corner) == int(ref.num_corner)
    assert bool(sh.degenerate) == bool(ref.degenerate)
    # and it actually solved the problem
    np.testing.assert_allclose(np.asarray(sh.pose.t), t2, atol=5e-2)


class TestShardedBackend:
    def test_matches_single_device_solve(self):
        """Factor-sharded PCG must agree with the single-device backend."""
        import numpy as np
        from pointcloud_slam_tpu import parallel
        from pointcloud_slam_tpu.models.liosam import backend as bk

        cfg = bk.BackendConfig(max_keyframes=64, max_loops=8, gn_iterations=4, pcg_iterations=40)
        rng = np.random.default_rng(0)
        g = bk.create(cfg)
        t_true = np.cumsum(rng.normal(0, 0.5, (40, 3)).astype(np.float32), axis=0)
        for k in range(40):
            noise = rng.normal(0, 0.02, 3).astype(np.float32)
            g = bk.add_keyframe(cfg, g, jnp.eye(3), jnp.asarray(t_true[k] + noise))
        g = bk.add_loop(cfg, g, jnp.asarray(2), jnp.asarray(30), jnp.eye(3),
                        jnp.asarray(t_true[30] - t_true[2]), jnp.full((6,), 1e3), robust=True)

        single = bk.optimize(cfg, g)
        mesh = parallel.make_mesh(8)
        sharded = parallel.sharded_optimize(mesh, cfg, g)
        np.testing.assert_allclose(np.asarray(sharded.t), np.asarray(single.t), atol=2e-4)
        np.testing.assert_allclose(np.asarray(sharded.R), np.asarray(single.R), atol=2e-4)

    def test_1k_node_sharded_solve_matches_single_device(self):
        """1024-node graph with 16 loops: the slot-sharded linearization +
        psum'd assembly must reproduce the single-device solve."""
        import numpy as np
        from pointcloud_slam_tpu import parallel
        from pointcloud_slam_tpu.models.liosam import backend as bk

        KF = 1024
        cfg = bk.BackendConfig(max_keyframes=KF, max_loops=32, gn_iterations=3, pcg_iterations=40)
        rng = np.random.default_rng(1)
        # direct graph construction (bulk): circular drifting trajectory
        ang = np.linspace(0, 2 * np.pi, KF)
        t_true = np.stack([30 * np.cos(ang), 30 * np.sin(ang), 0.1 * ang], 1).astype(np.float32)
        t_noisy = t_true + np.cumsum(rng.normal(0, 0.01, (KF, 3)), 0).astype(np.float32)
        odom_t = np.zeros((KF, 3), np.float32)
        odom_t[1:] = t_true[1:] - t_true[:-1]
        g = bk.create(cfg)._replace(
            t=jnp.asarray(t_noisy),
            n=jnp.asarray(KF, jnp.int32),
            odom_t=jnp.asarray(odom_t),
            odom_info=jnp.full((KF, 6), 1e4, jnp.float32),
        )
        li = np.arange(16, dtype=np.int32) * 30
        lj = li + 512
        g = g._replace(
            loop_i=jnp.zeros(32, jnp.int32).at[:16].set(jnp.asarray(li)),
            loop_j=jnp.zeros(32, jnp.int32).at[:16].set(jnp.asarray(lj)),
            loop_t=jnp.zeros((32, 3), jnp.float32).at[:16].set(jnp.asarray(t_true[lj] - t_true[li])),
            loop_info=jnp.zeros((32, 6), jnp.float32).at[:16].set(1e3),
            n_loops=jnp.asarray(16, jnp.int32),
        )

        single = bk.optimize(cfg, g)
        mesh = parallel.make_mesh(8)
        sharded = parallel.sharded_optimize(mesh, cfg, g)
        # agreement is limited by float32 summation order (psum vs in-order
        # factor accumulation) at |t| ~ 30 m; measured max deviation 1e-4
        np.testing.assert_allclose(np.asarray(sharded.t), np.asarray(single.t), atol=5e-4)
        np.testing.assert_allclose(np.asarray(sharded.R), np.asarray(single.R), atol=5e-4)
        # and the (budget-limited: 3 GN x 40 PCG) solve moved toward truth —
        # full convergence quality is bench config 5's claim, not this test's
        err0 = np.linalg.norm(t_noisy - t_true, axis=1).max()
        err1 = np.linalg.norm(np.asarray(sharded.t) - t_true, axis=1).max()
        assert err1 < 0.85 * err0, (err0, err1)
