"""Large-world maps: tiled 2-D occupancy (quadtree extendMap role) and the
hash-based unbounded 3-D occupancy (octomap_server role)."""

import numpy as np
import jax.numpy as jnp

from pointcloud_slam_tpu.maps import occupancy as occ
from pointcloud_slam_tpu.maps import tiled

CFG = occ.OccupancyConfig(size=128, resolution=0.25, max_range=10.0, min_z=-1.0, max_z=2.0)


def corridor_scan(pose_x, half_w=6.0, n=2880):
    """Scan of a FIXED infinite corridor (walls at y = +-half_w) seen from
    (pose_x, 0): consistent world geometry across the whole trajectory."""
    ang = np.linspace(-np.pi, np.pi, n, endpoint=False)
    c, s = np.cos(ang), np.sin(ang)
    with np.errstate(divide="ignore"):
        r = half_w / np.maximum(np.abs(s), 1e-9)  # distance to wall y = +-half_w
    keep = r < 1e6
    pts = np.stack([pose_x + r * c, np.sign(s) * half_w * np.ones(n), np.full(n, 0.5)], axis=0)
    return jnp.asarray(pts.astype(np.float32)), jnp.asarray(keep)


class TestTiledOccupancy:
    def test_trajectory_leaves_initial_tile(self):
        # tile extent = 128 * 0.25 = 32 m; walk 80 m -> at least 3 tiles
        m = tiled.TiledOccupancyMap(CFG)
        xs = np.arange(0.0, 80.0, 4.0)
        for x in xs:
            pts, msk = corridor_scan(x)
            m.insert_cloud(pts, msk, np.asarray([x, 0.0], np.float32), 0.0)
        assert len({k[0] for k in m.tiles}) >= 3, "trajectory must span multiple tiles"
        lo, origin = m.stitch()
        # corridor walls near every visited pose must be occupied
        hits = 0
        for x in xs[::4]:
            gi = int((x - origin[0]) / CFG.resolution)
            gj = int((6.0 - origin[1]) / CFG.resolution)
            if (lo[gi - 2 : gi + 3, gj - 2 : gj + 3] > 0).any():
                hits += 1
        assert hits >= len(xs[::4]) - 1, f"wall cells missing in stitched map ({hits})"
        # free space at the pose itself
        gi = int((40.0 - origin[0]) / CFG.resolution)
        gj = int((0.0 - origin[1]) / CFG.resolution)
        assert lo[gi, gj] < 0

    def test_save_stitched_pgm(self, tmp_path):
        m = tiled.TiledOccupancyMap(CFG)
        for x in [0.0, 30.0, 60.0]:
            pts, msk = corridor_scan(x)
            m.insert_cloud(pts, msk, np.asarray([x, 0.0], np.float32), 0.0)
        path = str(tmp_path / "bigmap")
        m.save_pgm(path)
        grid, meta = occ.load_pgm(path)
        assert (grid == 100).sum() > 100  # walls present
        assert (grid == 0).sum() > 1000   # interiors free


class Test3DOccupancy:
    def test_insert_and_project(self):
        cfg = tiled.VoxelOccConfig(capacity=1 << 16, resolution=0.25, n_free_steps=16)
        m = tiled.create_3d(cfg)
        # a wall of points at x = 5, sensor at origin: wall occupied, path free
        n = 256
        ys = np.linspace(-2, 2, n)
        pts = jnp.asarray(np.stack([np.full(n, 5.0), ys, np.full(n, 0.5)], 0).astype(np.float32))
        mask = jnp.ones(n, bool)
        for _ in range(3):
            m = tiled.insert_cloud_3d(cfg, m, pts, mask, jnp.zeros(3))
        vox = tiled.occupied_voxels(cfg, m)
        assert len(vox) > 0
        assert np.all(np.abs(vox[:, 0] - 5.0) < 0.5), "occupied voxels must sit on the wall"
        img = tiled.project_2d(cfg, m, 0.0, 1.0, size=64, res2d=0.25, origin_xy=(-8.0, -8.0))
        assert (img == 100).sum() > 10

    def test_unbounded_extent(self):
        # points far outside any dense bound still land in the hash map
        cfg = tiled.VoxelOccConfig(capacity=1 << 14, resolution=0.5, n_free_steps=8)
        m = tiled.create_3d(cfg)
        far = jnp.asarray(np.asarray([[5000.0], [5000.0], [3.0]], np.float32))
        m = tiled.insert_cloud_3d(cfg, m, far, jnp.ones(1, bool), jnp.asarray([4990.0, 5000.0, 0.0]))
        vox = tiled.occupied_voxels(cfg, m)
        assert len(vox) == 1
        np.testing.assert_allclose(vox[0, :2], [5000.25, 5000.25], atol=0.5)
