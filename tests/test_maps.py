"""Occupancy mapping tests."""

import os

import numpy as np
import jax.numpy as jnp

from pointcloud_slam_tpu.maps import occupancy, pcd2map


def soa(x):
    return jnp.asarray(np.ascontiguousarray(np.asarray(x).T))


CFG = occupancy.OccupancyConfig(size=256, resolution=0.1, origin=-12.8, n_beams=360, max_range=10.0)


def square_room_cloud(half=5.0, n_per_wall=400, z=0.7, seed=0):
    rng = np.random.default_rng(seed)
    pts = []
    for axis, sign in [(0, 1), (0, -1), (1, 1), (1, -1)]:
        u = rng.uniform(-half, half, n_per_wall)
        p = np.zeros((n_per_wall, 3), np.float32)
        p[:, axis] = sign * half
        p[:, 1 - axis] = u
        p[:, 2] = z
        pts.append(p)
    return np.concatenate(pts)


class TestOccupancy:
    def test_walls_occupied_interior_free(self):
        cloud = square_room_cloud()
        grid = occupancy.create(CFG)
        grid = occupancy.insert_cloud(CFG, grid, soa(cloud), jnp.ones(len(cloud), bool), jnp.zeros(2), jnp.zeros(()))
        p = np.asarray(occupancy.to_probability(CFG, grid))
        res, org = CFG.resolution, CFG.origin

        def cell_max(x, y):
            i, j = int((x - org) / res), int((y - org) / res)
            return p[i - 1 : i + 2, j - 1 : j + 2].max()

        def cell(x, y):
            return p[int((x - org) / res), int((y - org) / res)]

        # wall hits land in one of the two boundary cells
        assert cell_max(5.0, 0.0) > 0.6, "wall cell must be occupied"
        assert cell_max(0.0, 5.0) > 0.6
        assert cell(2.0, 0.0) < 0.4, "interior must be traced free"
        assert cell(0.0, 0.0) < 0.4

    def test_repeated_scans_harden(self):
        cloud = square_room_cloud()
        grid = occupancy.create(CFG)
        for _ in range(4):
            grid = occupancy.insert_cloud(CFG, grid, soa(cloud), jnp.ones(len(cloud), bool), jnp.zeros(2), jnp.zeros(()))
        p = np.asarray(occupancy.to_probability(CFG, grid))
        occ_frac = (p > 0.65).mean()
        free_frac = (p < 0.196).mean()
        assert occ_frac > 0.001
        assert free_frac > 0.05

    def test_ros_grid_trinary(self):
        cloud = square_room_cloud()
        grid = occupancy.create(CFG)
        grid = occupancy.insert_cloud(CFG, grid, soa(cloud), jnp.ones(len(cloud), bool), jnp.zeros(2), jnp.zeros(()))
        g = np.asarray(occupancy.to_ros_grid(CFG, grid))
        assert set(np.unique(g)).issubset({-1, 0, 100})
        assert (g == -1).any() and (g == 0).any() and (g == 100).any()

    def test_save_pgm(self, tmp_path):
        cloud = square_room_cloud()
        grid = occupancy.create(CFG)
        grid = occupancy.insert_cloud(CFG, grid, soa(cloud), jnp.ones(len(cloud), bool), jnp.zeros(2), jnp.zeros(()))
        path = str(tmp_path / "map")
        occupancy.save_pgm(CFG, grid, path)
        assert os.path.exists(path + ".pgm") and os.path.exists(path + ".yaml")
        with open(path + ".pgm", "rb") as f:
            header = f.readline()
            assert header.strip() == b"P5"


class TestVolume:
    def test_insert_and_project(self):
        cfg = pcd2map.VolumeConfig(nx=64, ny=64, nz=16, resolution=0.2, origin=(-6.4, -6.4, -1.6))
        vol = pcd2map.create_volume(cfg)
        pts = np.array([[1.0, 1.0, 0.0]] * 3 + [[-2.0, 3.0, 0.5]] * 3, np.float32)
        vol = pcd2map.insert_volume(cfg, vol, soa(pts), jnp.ones(6, bool))
        proj = np.asarray(pcd2map.project_2d(cfg, vol, min_hits=2))
        assert proj[int((1.0 + 6.4) / 0.2), int((1.0 + 6.4) / 0.2)]
        assert proj[int((-2.0 + 6.4) / 0.2), int((3.0 + 6.4) / 0.2)]
        assert proj.sum() == 2

    def test_nav_cloud(self):
        rng = np.random.default_rng(0)
        pts = rng.uniform(-3, 3, (2000, 3)).astype(np.float32)
        out, mask = pcd2map.pcd_to_nav_cloud(soa(pts), jnp.ones(2000, bool), leaf=0.5, z_min=0.0, z_max=1.0)
        out, mask = np.asarray(out), np.asarray(mask)
        assert mask.sum() > 0
        assert (out[2, mask] >= 0).all() and (out[2, mask] <= 1.0).all()
