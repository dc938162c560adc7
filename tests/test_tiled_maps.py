"""Large-world maps: tiled 2-D occupancy (quadtree extendMap role) and the
hash-based unbounded 3-D occupancy (octomap_server role)."""

import os

import numpy as np
import jax.numpy as jnp

from pointcloud_slam_tpu.maps import occupancy as occ
from pointcloud_slam_tpu.maps import octomap_io, tiled

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


class TestOctomapBt:
    """`.bt` octree artifact parity (octomap_server/octomap_saver role,
    src/tool/octomap_server/src/OctomapServer.cpp)."""

    def _map(self):
        cfg = tiled.VoxelOccConfig(capacity=1 << 16, resolution=0.25, n_free_steps=16)
        m = tiled.create_3d(cfg)
        n = 256
        ys = np.linspace(-2, 2, n)
        pts = jnp.asarray(np.stack([np.full(n, 5.0), ys, np.full(n, 0.5)], 0).astype(np.float32))
        for _ in range(3):
            m = tiled.insert_cloud_3d(cfg, m, pts, jnp.ones(n, bool), jnp.zeros(3))
        return cfg, m

    def test_roundtrip(self, tmp_path):
        cfg, m = self._map()
        p = str(tmp_path / "map.bt")
        n_nodes = octomap_io.save_bt(p, cfg, m)
        assert n_nodes > 1
        res, occ_pts, free_pts = octomap_io.load_bt(p)
        assert res == cfg.resolution
        # exact voxel-set roundtrip vs the hash map's own export
        vox = tiled.occupied_voxels(cfg, m)
        assert len(occ_pts) == len(vox)
        a = set(map(tuple, np.round(vox / res - 0.5).astype(int)))
        b = set(map(tuple, np.round(occ_pts / res - 0.5).astype(int)))
        assert a == b
        # known-free space (the sensor->wall corridor) must be present too
        assert len(free_pts) > 0
        assert free_pts[:, 0].min() < 4.0, "free leaves must cover the ray path"
        # header is the octomap wire header
        head = open(p, "rb").read(80).split(b"\n")
        assert head[0] == b"# Octomap OcTree binary file"

    def test_empty_map_writes_size_zero(self, tmp_path):
        """An empty map must serialize as octomap's empty-tree convention
        (size 0, no body) — 'size 1' with a zero-byte body would make
        octomap's readBinary hit EOF reading the root's child bytes."""
        cfg = tiled.VoxelOccConfig(capacity=1 << 10, resolution=0.1)
        m = tiled.create_3d(cfg)
        p = str(tmp_path / "empty.bt")
        n_nodes = octomap_io.save_bt(p, cfg, m)
        assert n_nodes == 0
        raw = open(p, "rb").read()
        assert b"size 0\n" in raw
        assert raw.endswith(b"data\n")  # no body bytes after the header
        res, occ_pts, free_pts = octomap_io.load_bt(p)
        assert len(occ_pts) == 0 and len(free_pts) == 0

    def test_construct_full_map_bt_output(self, tmp_path):
        """The product surface: `construct_full_map --bt` builds a .bt octree
        from keyframe Scans + poses (octomap_saver role) that loads back."""
        import subprocess
        import sys

        from pointcloud_slam_tpu.io import pcd as pcdio

        root = os.path.join(os.path.dirname(__file__), "..")
        rng = np.random.default_rng(3)
        kd = tmp_path / "run"
        (kd / "Scans").mkdir(parents=True)
        poses = []
        for k in range(3):
            pts = rng.uniform(-2, 2, (400, 3)).astype(np.float32) + [5.0, 0, 1]
            pcdio.write_pcd(str(kd / "Scans" / f"{k:06d}.pcd"), pts)
            t = np.array([0.5 * k, 0.0, 0.0])
            poses.append(np.hstack([np.eye(3), t[:, None]]).reshape(-1))
        np.savetxt(str(kd / "poses_kitti.txt"), np.stack(poses))
        bt = str(tmp_path / "map.bt")
        r = subprocess.run(
            [sys.executable, os.path.join(root, "apps", "construct_full_map.py"),
             str(kd), "--out", str(tmp_path / "full.pcd"), "--bt", bt, "--platform", "cpu"],
            capture_output=True, text=True, timeout=600,
            env={**os.environ, "JAX_PLATFORMS": "cpu"},
        )
        assert r.returncode == 0, r.stderr[-2000:]
        res, occ_pts, _free = octomap_io.load_bt(bt)
        assert res == 0.2 and len(occ_pts) > 0
        # occupied voxels sit where the transformed scans are
        assert abs(occ_pts[:, 0].mean() - 5.5) < 1.5

    def test_pruned_coarse_leaves_expand(self, tmp_path):
        """A hand-written pruned tree (one occupied leaf at depth 15, i.e. a
        2x2x2-voxel cube) loads to the expanded voxel set — the shape
        octomap's own pruning writer produces."""
        p = str(tmp_path / "pruned.bt")
        # pairs 1..14 are the nodes at depths 0..13, each marking child 0 as
        # inner; pair 15 (node at depth 14) marks child 0 as an occupied
        # LEAF at depth 15 -> side 2^(16-15) = 2 voxels per axis
        body = bytes([0b11, 0]) * 14 + bytes([0b01, 0])
        with open(p, "wb") as f:
            f.write(b"# Octomap OcTree binary file\n")
            f.write(b"id OcTree\nsize 16\nres 0.5\ndata\n")
            f.write(body)
        res, occ_pts, free_pts = octomap_io.load_bt(p)
        assert res == 0.5
        assert len(occ_pts) == 8 and len(free_pts) == 0
        # the 8 voxel keys fill the corner cube {0,1}^3 (key 0 = voxel index
        # -32768; centers are (key - 32768 + 0.5) * res)
        k = sorted(map(tuple, np.round(occ_pts / res - 0.5 + (1 << 15)).astype(int)))
        assert k == sorted({(x, y, z) for x in (0, 1) for y in (0, 1) for z in (0, 1)})
        # oversize handling: an expansion cap below the leaf raises by
        # default, skips on request, and the box-level iterator is lossless
        import pytest
        with pytest.raises(ValueError, match="max_expand_side"):
            octomap_io.load_bt(p, max_expand_side=1)
        _, occ2, _ = octomap_io.load_bt(p, max_expand_side=1, oversize="skip")
        assert len(occ2) == 0
        leaves = list(octomap_io.iter_bt_leaves(p))
        assert len(leaves) == 1
        center, side_m, occupied = leaves[0]
        assert occupied and side_m == 2 * res
        np.testing.assert_allclose(center, ((np.zeros(3) - (1 << 15)) + 1.0) * res)
