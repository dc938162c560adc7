"""Localization pipeline + PCD io tests."""

import numpy as np
import jax.numpy as jnp

from pointcloud_slam_tpu import ops, register
from pointcloud_slam_tpu.geom import se3, so3
from pointcloud_slam_tpu.io import pcd, synthetic
from pointcloud_slam_tpu.models import localization
from pointcloud_slam_tpu.models.liosam import scan2map as s2m
from pointcloud_slam_tpu.ops import gaussian_grid as gg


def soa(x):
    return jnp.asarray(np.ascontiguousarray(np.asarray(x).T))


class TestPCD:
    def test_roundtrip_binary(self, tmp_path, rng):
        pts = rng.normal(size=(500, 3)).astype(np.float32)
        path = str(tmp_path / "cloud.pcd")
        pcd.write_pcd(path, pts)
        back = pcd.read_pcd_xyz(path)
        np.testing.assert_allclose(back, pts, atol=1e-6)

    def test_roundtrip_ascii(self, tmp_path, rng):
        pts = rng.normal(size=(100, 3)).astype(np.float32)
        inten = rng.uniform(0, 255, 100).astype(np.float32)
        path = str(tmp_path / "cloud_ascii.pcd")
        pcd.write_pcd(path, pts, intensity=inten, binary=False)
        d = pcd.read_pcd(path)
        np.testing.assert_allclose(np.stack([d["x"], d["y"], d["z"]], 1), pts, atol=1e-4)
        np.testing.assert_allclose(d["intensity"], inten, atol=1e-2)

    def test_arealist(self, tmp_path):
        path = str(tmp_path / "arealist.csv")
        with open(path, "w") as f:
            f.write("tile_0.pcd,0,0,0,50,50,10\n")
            f.write("tile_1.pcd,50,0,0,100,50,10\n")
        areas = pcd.read_arealist(path)
        assert len(areas) == 2
        hits = pcd.tiles_for_position(areas, 25.0, 25.0, margin=0.0)
        assert len(hits) == 1 and hits[0]["path"] == "tile_0.pcd"
        hits = pcd.tiles_for_position(areas, 49.0, 25.0, margin=5.0)
        assert len(hits) == 2


class TestLocalizationNDT:
    def test_localize_and_loss_detection(self):
        world = synthetic.make_room_cloud(6000, seed=0)
        cfg = localization.LocalizationConfig(method="ndt", fitness_thresh=0.15)
        # baked=True is the tile-map layout run_localization ships (one wide
        # gather per query; equivalence to unbaked is tested in
        # test_registration.test_baked_target_matches_unbaked)
        ndt_grid_cfg, ndt_map = register.ndt.build_target(cfg.ndt, soa(world), baked=True)
        pt_cfg = ops.GridConfig(capacity=1 << 14, pts_per_voxel=8, resolution=1.0, nearby=7)
        pt_map = ops.insert(pt_cfg, ops.create(pt_cfg), soa(world), jnp.ones(len(world), bool))

        R, t = synthetic.random_pose(seed=1, rot_scale=0.03, trans_scale=0.2)
        scan = ((world[:3000] - t) @ R).astype(np.float32)
        res = localization.localize_ndt(
            cfg, ndt_grid_cfg, ndt_map, pt_cfg, pt_map, soa(scan), jnp.ones(3000, bool), se3.identity()
        )
        assert not bool(res.lost)
        assert np.linalg.norm(np.asarray(res.pose.t) - t) < 0.1
        # garbage scan (far away) -> loss
        bad = scan + np.array([200.0, 0, 0], np.float32)
        res_bad = localization.localize_ndt(
            cfg, ndt_grid_cfg, ndt_map, pt_cfg, pt_map, soa(bad), jnp.ones(3000, bool), se3.identity()
        )
        assert bool(res_bad.lost)
        # relocalize falls back to the provided pose
        fb = se3.Pose(jnp.asarray(R), jnp.asarray(t))
        p = localization.relocalize(res_bad, fb)
        np.testing.assert_allclose(np.asarray(p.t), t, atol=1e-6)


class TestOdomFeed:
    """UKF external-odom + GPS init feeds (localization.cpp:482-520)."""

    def test_ukf_feed_lever_arm_and_latest_wins(self):
        from pointcloud_slam_tpu.io import odom_feed

        # two messages; 90-degree yaw at t=1 so the lever arm rotates
        rows = np.array([
            [0.0, 1.0, 2.0, 0.5, 1.0, 0.0, 0.0, 0.0],
            [1.0, 4.0, 5.0, 0.5, np.cos(np.pi / 4), 0.0, 0.0, np.sin(np.pi / 4)],
        ])
        feed = odom_feed.UkfOdomFeed(rows, lever_arm=(1.0, 0.0, 0.0))
        assert feed.initial_pose_at(-0.5) is None  # before first message
        pos, yaw = feed.initial_pose_at(0.5)
        np.testing.assert_allclose(pos, [2.0, 2.0, 0.5], atol=1e-6)
        assert abs(yaw) < 1e-6
        pos, yaw = feed.initial_pose_at(10.0)  # latest message wins
        np.testing.assert_allclose(pos, [4.0, 6.0, 0.5], atol=1e-6)
        assert abs(yaw - np.pi / 2) < 1e-6

    def test_gps_init_gate(self):
        from pointcloud_slam_tpu.io import odom_feed

        # good fix
        pos = odom_feed.gps_init_position((10.0, 20.0, 1.0), (0.001, 0.001))
        np.testing.assert_allclose(pos, [10.0, 20.0, 1.0], atol=1e-6)
        # covariance gate (>= 0.003 rejected, localization.cpp:507)
        assert odom_feed.gps_init_position((10.0, 20.0, 1.0), (0.003, 0.001)) is None
        # zero fix rejected
        assert odom_feed.gps_init_position((0.0, 0.0, 1.0), (0.001, 0.001)) is None
        # lever arm applied through the quaternion
        q = (np.cos(np.pi / 4), 0.0, 0.0, np.sin(np.pi / 4))  # 90-deg yaw
        pos = odom_feed.gps_init_position((10.0, 20.0, 1.0), (0.001, 0.001), quat=q, lever_arm=(1.0, 0.0, 0.0))
        np.testing.assert_allclose(pos, [10.0, 21.0, 1.0], atol=1e-6)
