"""Point-to-plane ICP recovery tests (forward/backward/identity invariances,
mirroring the reference's gicp_test.cpp FORWARD/BACKWARD suite)."""

import numpy as np
import jax
import jax.numpy as jnp

from pointcloud_slam_tpu import ops, register
from pointcloud_slam_tpu.geom import se3, so3
from pointcloud_slam_tpu.io import synthetic

GRID = ops.GridConfig(capacity=1 << 15, pts_per_voxel=16, resolution=0.5, nearby=7)


def setup_pair(seed=0, n=4000):
    world = synthetic.make_room_cloud(n, seed=seed)
    R, t = synthetic.random_pose(seed=seed + 1, rot_scale=0.05, trans_scale=0.3)
    # source = inverse-transformed world points: aligning source to map should recover (R, t)
    src = (world - t) @ R  # R^T applied: src = R^T (w - t)
    return world, src.astype(np.float32), R, t


def soa(x):
    return jnp.asarray(np.ascontiguousarray(np.asarray(x).T))


def run_icp(world, src, init=None):
    grid_cfg, grid = register.build_target_map(soa(world), grid_cfg=GRID)
    res = register.point_to_plane_icp(grid_cfg, grid, soa(src), init_pose=init)
    return res


class TestPointToPlaneICP:
    def test_identity(self):
        world, _, _, _ = setup_pair()
        res = run_icp(world, world)
        np.testing.assert_allclose(np.asarray(res.pose.R), np.eye(3), atol=1e-3)
        np.testing.assert_allclose(np.asarray(res.pose.t), 0, atol=1e-2)

    def test_forward_recovery(self):
        world, src, R, t = setup_pair(seed=0)
        res = run_icp(world, src)
        rot_err = np.degrees(np.linalg.norm(np.asarray(so3.log(jnp.asarray(R.T) @ res.pose.R))))
        trans_err = np.linalg.norm(np.asarray(res.pose.t) - t)
        assert rot_err < 0.5, f"rotation error {rot_err} deg"
        assert trans_err < 0.05, f"translation error {trans_err} m"
        assert bool(res.converged)

    def test_backward_recovery(self):
        # swap roles: target was the source's frame
        world, src, R, t = setup_pair(seed=3)
        res = run_icp(src, world)  # align world to src-map: expect inverse pose
        R_inv, t_inv = R.T, -R.T @ t
        rot_err = np.degrees(np.linalg.norm(np.asarray(so3.log(jnp.asarray(R_inv.T) @ res.pose.R))))
        trans_err = np.linalg.norm(np.asarray(res.pose.t) - t_inv)
        assert rot_err < 0.5
        assert trans_err < 0.05

    def test_warm_start_bigger_offset(self):
        world, _, _, _ = setup_pair(seed=5)
        R, t = synthetic.random_pose(seed=9, rot_scale=0.3, trans_scale=1.0)
        src = ((world - t) @ R).astype(np.float32)
        # warm start halfway between identity and the true pose
        w_half = np.asarray(so3.log(jnp.asarray(R))) * 0.5
        init = se3.Pose(so3.exp(jnp.asarray(w_half, jnp.float32)), jnp.asarray(t * 0.5, jnp.float32))
        res = run_icp(world, src, init=init)
        trans_err = np.linalg.norm(np.asarray(res.pose.t) - t)
        assert trans_err < 0.1

    def test_num_inliers_reported(self):
        world, src, _, _ = setup_pair()
        res = run_icp(world, src)
        assert int(res.num_inliers) > len(src) * 0.5

    def test_fitness_score(self):
        world, src, R, t = setup_pair()
        grid_cfg, grid = register.build_target_map(soa(world), grid_cfg=GRID)
        pose = se3.Pose(jnp.asarray(R), jnp.asarray(t))
        aligned = pose.apply(soa(src))
        score, n = register.fitness_score(grid_cfg, grid, aligned, jnp.ones(len(src), bool))
        assert float(score) < 1e-3
        misaligned = soa(src) + jnp.asarray([[0.3], [0.2], [0.1]])
        score2, _ = register.fitness_score(grid_cfg, grid, misaligned, jnp.ones(len(src), bool))
        assert float(score2) > float(score)

    def test_jit_compiles_once(self):
        """The whole solve must be jittable as a single program."""
        world, src, _, _ = setup_pair()
        grid_cfg, grid = register.build_target_map(soa(world), grid_cfg=GRID)

        @jax.jit
        def solve(grid, src):
            return register.point_to_plane_icp(grid_cfg, grid, src)

        res = solve(grid, soa(src))
        assert bool(res.converged)
