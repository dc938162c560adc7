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
