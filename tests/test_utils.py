"""Utils tests: config YAML, checkpoint roundtrip, timer registry."""

import os

import numpy as np
import jax.numpy as jnp

from pointcloud_slam_tpu.utils import checkpoint as ck
from pointcloud_slam_tpu.utils import config as cfgio
from pointcloud_slam_tpu.utils.timer import Timer


class TestConfig:
    def test_yaml_roundtrip(self, tmp_path):
        cfg = {
            "mapping": {"filter_size_surf": 0.5, "max_iteration": 4, "extrinsic_est_en": True},
            "lidar_type": 1,
            "extrinsic_T": [0.04165, 0.02326, -0.0284],
            "name": "livox",
        }
        path = str(tmp_path / "cfg.yaml")
        cfgio.save_yaml(path, cfg)
        back = cfgio.load_yaml(path)
        assert back["mapping"]["filter_size_surf"] == 0.5
        assert back["mapping"]["max_iteration"] == 4
        assert back["mapping"]["extrinsic_est_en"] is True
        assert back["extrinsic_T"] == [0.04165, 0.02326, -0.0284]
        assert back["name"] == "livox"

    def test_overlay(self, tmp_path):
        local = str(tmp_path / "local.yaml")
        system = str(tmp_path / "system.yaml")
        cfgio.save_yaml(local, {"a": 1, "nest": {"x": 1, "y": 2}})
        cfgio.save_yaml(system, {"nest": {"y": 9}})
        merged = cfgio.load_with_overlay(local, system)
        assert merged["a"] == 1 and merged["nest"]["x"] == 1 and merged["nest"]["y"] == 9


class TestCheckpoint:
    def test_pytree_roundtrip(self, tmp_path):
        from pointcloud_slam_tpu import ops
        from pointcloud_slam_tpu.models import lio

        cfg = lio.LIOConfig(grid=ops.GridConfig(capacity=1 << 8, pts_per_voxel=4))
        state = lio.create_state(cfg)
        path = str(tmp_path / "state.npz")
        ck.save_state(path, state)
        state2 = ck.load_state(path, lio.create_state(cfg))
        for a, b in zip(
            __import__("jax").tree.leaves(state), __import__("jax").tree.leaves(state2)
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_trajectory_exports(self, tmp_path):
        times = [0.1, 0.2]
        poss = [np.zeros(3), np.ones(3)]
        quats = [np.array([0, 0, 0, 1.0])] * 2
        tum = str(tmp_path / "traj.txt")
        ck.save_trajectory_tum(tum, times, poss, quats)
        data = np.loadtxt(tum)
        assert data.shape == (2, 8)
        kitti = str(tmp_path / "poses.txt")
        ck.save_poses_kitti(kitti, [np.eye(3)] * 2, poss)
        data = np.loadtxt(kitti)
        assert data.shape == (2, 12)

    def test_scd_roundtrip(self, tmp_path):
        d = np.random.default_rng(0).uniform(0, 3, (20, 60)).astype(np.float32)
        path = str(tmp_path / "k.scd")
        ck.save_scd(path, d)
        back = ck.load_scd(path)
        np.testing.assert_allclose(back, d, atol=1e-3)


class TestTimer:
    def test_evaluate_and_dump(self, tmp_path):
        Timer.reset()
        out = Timer.evaluate(lambda: jnp.sum(jnp.ones(8)), "stage_a")
        assert float(out) == 8.0
        Timer.record("stage_b", 1.5)
        Timer.record("stage_b", 2.5)
        assert abs(Timer.mean("stage_b") - 2.0) < 1e-9
        path = str(tmp_path / "times.csv")
        Timer.dump_into_file(path)
        lines = open(path).read().strip().splitlines()
        assert lines[0] == "stage_a,stage_b"
        assert len(lines) == 3  # header + 2 rows (stage_b has 2 entries)
        Timer.reset()


class TestLogging:
    def test_glog_prefix_and_levels(self, capsys):
        from pointcloud_slam_tpu.utils import log

        lg = log.get_logger("test")
        lg.info("hello")
        lg.warning("watch out")
        err = capsys.readouterr().err
        assert "hello" in err and "watch out" in err
        # glog-style single-letter severities
        assert err.splitlines()[0].startswith("I")
        assert err.splitlines()[1].startswith("W")

    def test_debug_channels(self, tmp_path):
        from pointcloud_slam_tpu.utils import log

        dbg = log.DebugChannels(str(tmp_path), enabled=["effect_points"])
        # disabled channel is a no-op
        dbg.publish("loop_constraints", 0, pairs=np.zeros((2, 2)))
        dbg.publish("effect_points", 3, pts=np.ones((3, 4), np.float32))
        dbg.close()
        files = sorted(f.name for f in tmp_path.iterdir())
        assert files == ["effect_points_000000.npz"]
        with np.load(tmp_path / files[0]) as z:
            assert int(z["_frame"]) == 3
            assert z["pts"].shape == (3, 4)
