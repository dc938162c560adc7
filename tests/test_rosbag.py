"""ROS1 bag reader/writer (io/rosbag.py) — container roundtrips, message
(de)serialization, bz2 chunks, and bag-vs-directory replay equivalence
(the reference's rosbag replay input, run_mapping_offline.cc:46-82)."""

import bz2
import importlib.util
import os
import struct
import sys

import numpy as np
import pytest

from pointcloud_slam_tpu.io import lz4, rosbag

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(path, name):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class TestRoundtrip:
    def test_imu(self, tmp_path):
        p = str(tmp_path / "a.bag")
        with rosbag.BagWriter(p) as bw:
            for i in range(5):
                bw.write_imu("/imu/data", 100.0 + i * 0.01,
                             acc=(0.1 * i, -0.2, 9.81), gyro=(0.0, 0.01 * i, -0.02))
        msgs = list(rosbag.read_bag(p))
        assert len(msgs) == 5
        topic, typ, t, m = msgs[3]
        assert topic == "/imu/data" and typ == "sensor_msgs/Imu"
        assert abs(t - 100.03) < 1e-6 and abs(m["stamp"] - 100.03) < 1e-6
        np.testing.assert_allclose(m["acc"], [0.3, -0.2, 9.81], atol=1e-12)
        np.testing.assert_allclose(m["gyro"], [0.0, 0.03, -0.02], atol=1e-12)

    def test_pointcloud2_xyzirt(self, tmp_path, rng):
        """Vendor-style XYZIRT schema survives the structured-dtype path."""
        p = str(tmp_path / "a.bag")
        n = 257
        cloud = {
            "x": rng.normal(size=n).astype(np.float32),
            "y": rng.normal(size=n).astype(np.float32),
            "z": rng.normal(size=n).astype(np.float32),
            "intensity": rng.uniform(0, 255, n).astype(np.float32),
            "ring": rng.integers(0, 16, n).astype(np.uint16),
            "time": np.linspace(0, 0.1, n).astype(np.float32),
        }
        with rosbag.BagWriter(p) as bw:
            bw.write_pointcloud2("/rslidar_points", 7.25, cloud)
        [(topic, typ, t, m)] = list(rosbag.read_bag(p))
        assert typ == "sensor_msgs/PointCloud2" and abs(t - 7.25) < 1e-9
        for k in cloud:
            np.testing.assert_array_equal(m[k], cloud[k])
        assert m["ring"].dtype == np.uint16

    def test_livox_custom(self, tmp_path, rng):
        p = str(tmp_path / "a.bag")
        pts = rng.normal(size=(100, 3)).astype(np.float32)
        offs = (np.arange(100) * 1000).astype(np.uint32)
        with rosbag.BagWriter(p) as bw:
            bw.write_livox("/livox/lidar", 3.5, pts, offs,
                           reflectivity=np.full(100, 7, np.uint8),
                           line=np.arange(100).astype(np.uint8) % 6)
        [(topic, typ, t, m)] = list(rosbag.read_bag(p))
        assert typ == "livox_ros_driver/CustomMsg"
        np.testing.assert_array_equal(np.stack([m["x"], m["y"], m["z"]], 1), pts)
        np.testing.assert_array_equal(m["offset_time"], offs)
        np.testing.assert_array_equal(m["line"], np.arange(100) % 6)
        assert m["point_num"] == 100 and m["timebase"] == int(3.5e9)

    def test_mixed_topics_sorted_and_filtered(self, tmp_path):
        p = str(tmp_path / "a.bag")
        with rosbag.BagWriter(p) as bw:
            bw.write_imu("/imu/data", 2.0, (0, 0, 9.8), (0, 0, 0))
            bw.write_imu("/other_imu", 1.0, (1, 1, 1), (1, 1, 1))
            bw.write_imu("/imu/data", 0.5, (0, 0, 9.8), (0, 0, 0))
        ts = [t for _, _, t, _ in rosbag.read_bag(p)]
        assert ts == sorted(ts), "messages must come out time-sorted"
        only = list(rosbag.read_bag(p, topics=["/imu/data"]))
        assert len(only) == 2 and all(m[0] == "/imu/data" for m in only)


class TestChunkedBags:
    def _chunked_bag(self, path, compression):
        """Hand-build a CHUNKED bag (the shape `rosbag record` writes)."""
        inner = b""
        # connection record inside the chunk
        hdr = rosbag._pack_header({b"op": bytes([rosbag.OP_CONNECTION]),
                                   b"conn": struct.pack("<I", 0),
                                   b"topic": b"/imu/data"})
        data = rosbag._pack_header({b"topic": b"/imu/data",
                                    b"type": b"sensor_msgs/Imu", b"md5sum": b"*",
                                    b"message_definition": b""})
        inner += struct.pack("<I", len(hdr)) + hdr + struct.pack("<I", len(data)) + data
        raw = rosbag.serialize_imu(5.0, (0.5, 0, 9.8), (0, 0.1, 0))
        hdr = rosbag._pack_header({b"op": bytes([rosbag.OP_MSG]),
                                   b"conn": struct.pack("<I", 0),
                                   b"time": struct.pack("<II", 5, 0)})
        inner += struct.pack("<I", len(hdr)) + hdr + struct.pack("<I", len(raw)) + raw

        if compression == b"bz2":
            payload = bz2.compress(inner)
        elif compression == b"lz4":
            payload = lz4.frame_compress(inner)
        else:
            payload = inner
        chdr = rosbag._pack_header({b"op": bytes([rosbag.OP_CHUNK]),
                                    b"compression": compression,
                                    b"size": struct.pack("<I", len(inner))})
        with open(path, "wb") as f:
            f.write(rosbag.MAGIC)
            f.write(struct.pack("<I", len(chdr)) + chdr
                    + struct.pack("<I", len(payload)) + payload)

    @pytest.mark.parametrize("compression", [b"none", b"bz2", b"lz4"])
    def test_chunk(self, tmp_path, compression):
        p = str(tmp_path / "c.bag")
        self._chunked_bag(p, compression)
        [(topic, typ, t, m)] = list(rosbag.read_bag(p))
        assert topic == "/imu/data" and abs(t - 5.0) < 1e-9
        np.testing.assert_allclose(m["acc"], [0.5, 0, 9.8])

    def test_unsupported_compression_raises(self, tmp_path):
        p = str(tmp_path / "c.bag")
        self._chunked_bag(p, b"zstd")
        with pytest.raises(Exception):
            list(rosbag.read_bag(p))

    @pytest.mark.parametrize("compression", ["none", "bz2", "lz4"])
    def test_writer_chunked_roundtrip(self, tmp_path, compression):
        """BagWriter(chunk_compression=...) bags replay identically to the
        unchunked form through the Python reader (the rosbag-record shape —
        lz4 is the rosbag default on many robots)."""
        rng = np.random.default_rng(11)
        pts = rng.uniform(-5, 5, (200, 3)).astype(np.float32)
        offs = (np.linspace(0, 0.1, 200) * 1e9).astype(np.uint32)
        imu = [(rng.normal(0, 1, 3), rng.normal(0, 0.1, 3)) for _ in range(10)]

        def write(p, **kw):
            with rosbag.BagWriter(p, **kw) as bw:
                for k, (acc, gyro) in enumerate(imu):
                    bw.write_imu("/imu/data", 1.0 + 0.01 * k, acc, gyro)
                bw.write_livox("/livox/lidar", 1.05, pts, offs)

        p_plain = str(tmp_path / "plain.bag")
        p_chunk = str(tmp_path / "chunk.bag")
        write(p_plain)
        write(p_chunk, chunk_compression=compression, chunk_size=512)
        plain = list(rosbag.read_bag(p_plain))
        chunked = list(rosbag.read_bag(p_chunk))
        assert len(plain) == len(chunked) == 11
        for (to, ty, t, m), (to2, ty2, t2, m2) in zip(plain, chunked):
            assert (to, ty, t) == (to2, ty2, t2)
            for k in m:
                np.testing.assert_array_equal(np.asarray(m[k]), np.asarray(m2[k]))

    def test_native_reader_lz4_chunks(self, tmp_path):
        """The C++ reader (bagreader.cpp lz4_frame_decompress) replays an
        lz4-chunked bag identically to the Python reader."""
        from pointcloud_slam_tpu import native

        rng = np.random.default_rng(13)
        p = str(tmp_path / "l.bag")
        pts = rng.uniform(-5, 5, (300, 3)).astype(np.float32)
        with rosbag.BagWriter(p, chunk_compression="lz4", chunk_size=1024) as bw:
            for k in range(12):
                bw.write_imu("/imu/data", 2.0 + 0.01 * k, rng.normal(0, 1, 3), rng.normal(0, 0.1, 3))
            bw.write_livox("/livox/lidar", 2.06, pts, (np.linspace(0, 0.1, 300) * 1e9).astype(np.uint32))
        py = list(rosbag.read_bag(p))
        with native.NativeBagReader(p) as nb:
            assert len(nb) == len(py) == 13
            msgs = list(nb)
        clouds = [m for k, m in msgs if k == "cloud"]
        assert len(clouds) == 1
        _stamp, xyz, _t_abs, _inten, _ring = clouds[0]
        np.testing.assert_allclose(xyz, pts, atol=1e-6)

    def test_native_reader_rejects_corrupt_lz4_chunk(self, tmp_path):
        """A flipped byte inside an lz4 chunk must be REJECTED by the native
        fast path (bagreader.cpp xxh32 verification — round-4 weak #6: it
        used to skip checksums, so a truncated-but-well-formed chunk decoded
        to silently wrong bytes), with the same strictness as the Python
        reader (io/lz4.py)."""
        from pointcloud_slam_tpu import native

        rng = np.random.default_rng(7)
        p = tmp_path / "c.bag"
        pts = rng.uniform(-5, 5, (300, 3)).astype(np.float32)
        with rosbag.BagWriter(str(p), chunk_compression="lz4", chunk_size=1024) as bw:
            bw.write_livox("/livox/lidar", 2.0, pts,
                           (np.linspace(0, 0.1, 300) * 1e9).astype(np.uint32))
        raw = bytearray(p.read_bytes())
        magic = raw.find(b"\x04\x22\x4d\x18")
        assert magic > 0, "lz4 frame magic not found"
        raw[magic + 24] ^= 0x40  # flip a bit inside the first block's data
        bad = tmp_path / "bad.bag"
        bad.write_bytes(bytes(raw))
        with pytest.raises(ValueError):
            native.NativeBagReader(str(bad))
        with pytest.raises(ValueError):
            list(rosbag.read_bag(str(bad)))

    def test_not_a_bag(self, tmp_path):
        p = tmp_path / "x.bag"
        p.write_bytes(b"PCDv7\n")
        with pytest.raises(ValueError):
            rosbag.BagReader(str(p))


class TestSlamCloudSource:
    def test_bag_scans_feed_the_slam_app(self, tmp_path, rng):
        """run_slam_offline.cloud_source replays bag scans (CustomMsg converted
        the livox_repub way, IMU skipped, topic filter honored)."""
        app = _load(os.path.join(REPO, "apps", "run_slam_offline.py"), "rso")
        p = str(tmp_path / "s.bag")
        pts = rng.normal(size=(64, 3)).astype(np.float32)
        with rosbag.BagWriter(p) as bw:
            bw.write_imu("/imu/data", 0.995, (0, 0, 9.8), (0, 0, 0))
            bw.write_livox("/livox/lidar", 1.0, pts, np.arange(64, dtype=np.uint32) * 100)
            bw.write_pointcloud2("/other", 1.05, {"x": pts[:, 0], "y": pts[:, 1], "z": pts[:, 2]})

        class A: pass
        a = A(); a.bag_file = p; a.lidar_topic = ""; a.data_dir = ""
        scans = list(app.cloud_source(a))
        assert len(scans) == 2, "IMU must be skipped, both lidar topics kept"
        np.testing.assert_allclose(scans[0][1]["x"], pts[:, 0], atol=1e-6)
        assert "time" in scans[0][1], "CustomMsg conversion must add per-point times"
        # every scan must carry its stamp (the RS loop time gate input) — the
        # CustomMsg conversion used to drop it and the synthesized frame
        # clock silently took over
        assert abs(scans[0][1]["stamp"] - 1.0) < 1e-6
        assert abs(scans[1][1]["stamp"] - 1.05) < 1e-6
        a.lidar_topic = "/livox/lidar"
        assert len(list(app.cloud_source(a))) == 1


class TestBagReplayEquivalence:
    @pytest.mark.parametrize("bag_reader", ["python", "native"])
    def test_frames_match_directory_replay(self, tmp_path, bag_reader):
        """make_dataset --bag writes the same sequence as dir + bag;
        frames_from_bag (both the native C++ and pure-Python readers) and
        frames_from_dir must produce identical frames (same sync/windowing
        semantics as the reference's rosbag callbacks)."""
        md = _load(os.path.join(REPO, "tools", "make_dataset.py"), "make_dataset")
        app = _load(os.path.join(REPO, "apps", "run_mapping_offline.py"), "rmo")

        out = str(tmp_path / "seq")
        class A: pass
        a = A(); a.out = out; a.frames = 6; a.points = 500; a.seed = 3; a.bag = True
        md.gen_lio(a)
        assert os.path.exists(os.path.join(out, "data.bag"))

        args = A()
        args.data_dir = out; args.bag_file = os.path.join(out, "data.bag")
        args.lidar_topic = ""; args.imu_topic = ""
        args.n_points = 600; args.n_imu = 32
        args.bag_reader = bag_reader
        dir_frames = list(app.frames_from_dir(args))
        bag_frames = list(app.frames_from_bag(args))
        assert len(dir_frames) == len(bag_frames) == 6
        for (fd, td), (fb, tb) in zip(dir_frames, bag_frames):
            assert abs(td - tb) < 1e-6
            np.testing.assert_array_equal(np.asarray(fd.pt_mask), np.asarray(fb.pt_mask))
            np.testing.assert_allclose(np.asarray(fd.pts), np.asarray(fb.pts), atol=1e-5)
            # offset_time is quantized to ns in the bag
            np.testing.assert_allclose(np.asarray(fd.t_offs), np.asarray(fb.t_offs), atol=1e-6)
            np.testing.assert_allclose(np.asarray(fd.imu_acc), np.asarray(fb.imu_acc), atol=1e-6)
            np.testing.assert_allclose(np.asarray(fd.imu_gyro), np.asarray(fb.imu_gyro), atol=1e-6)
            np.testing.assert_allclose(np.asarray(fd.imu_offs), np.asarray(fb.imu_offs), atol=1e-6)
            np.testing.assert_allclose(np.asarray(fd.imu_dt), np.asarray(fb.imu_dt), atol=1e-6)
            np.testing.assert_array_equal(np.asarray(fd.imu_mask), np.asarray(fb.imu_mask))


class TestNativeBagReader:
    """native/src/bagreader.cpp vs the pure-Python reader on the same bag."""

    def _make_bag(self, path):
        rng = np.random.default_rng(7)
        with rosbag.BagWriter(str(path)) as bw:
            t0 = 1700000000.0
            for k in range(20):
                t = t0 + 0.01 * k
                bw.write_imu("/imu/data", t, rng.normal(0, 1, 3), rng.normal(0, 0.1, 3))
            pts = rng.uniform(-5, 5, (300, 3)).astype(np.float32)
            offs = (np.linspace(0, 0.1, 300) * 1e9).astype(np.uint32)
            bw.write_livox("/livox/lidar", t0 + 0.05, pts, offs,
                           reflectivity=np.full(300, 77, np.uint8),
                           line=(np.arange(300) % 6).astype(np.uint8))
            cloud = {
                "x": pts[:, 0], "y": pts[:, 1], "z": pts[:, 2],
                "intensity": rng.uniform(0, 255, 300).astype(np.float32),
                "ring": (np.arange(300) % 16).astype(np.uint16),
                "time": np.linspace(0, 0.1, 300).astype(np.float32),
            }
            bw.write_pointcloud2("/velodyne_points", t0 + 0.15, cloud)
        return pts

    def test_native_matches_python(self, tmp_path):
        from pointcloud_slam_tpu import native

        bag_path = tmp_path / "n.bag"
        pts = self._make_bag(bag_path)

        py_msgs = list(rosbag.read_bag(str(bag_path)))
        with native.NativeBagReader(str(bag_path)) as nb:
            assert len(nb) == len(py_msgs) == 22
            native_msgs = [(k, p) for k, p in nb]

        assert [k for k, _ in native_msgs] == [
            "imu" if m[1] == "sensor_msgs/Imu" else "cloud" for m in py_msgs
        ]
        # IMU payloads match the Python parser field-for-field
        for (kind, payload), (_, mtype, _, parsed) in zip(native_msgs, py_msgs):
            if kind != "imu":
                continue
            t, acc, gyro = payload
            assert abs(t - parsed["stamp"]) < 1e-6
            np.testing.assert_allclose(acc, parsed["acc"], rtol=1e-12)
            np.testing.assert_allclose(gyro, parsed["gyro"], rtol=1e-12)
        # livox cloud: xyz exact, times = stamp + offset_ns, intensity packing
        cloud_idx = [i for i, (k, _) in enumerate(native_msgs) if k == "cloud"]
        assert len(cloud_idx) == 2
        stamp, xyz, t_abs, intensity, ring = native_msgs[cloud_idx[0]][1]
        np.testing.assert_array_equal(xyz, pts)
        parsed = py_msgs[cloud_idx[0]][3]
        # sub-microsecond: epoch-magnitude float64 ulp is ~4e-7 s
        np.testing.assert_allclose(
            t_abs - stamp, np.asarray(parsed["offset_time"], np.float64) * 1e-9, atol=1e-6
        )
        np.testing.assert_allclose(
            intensity, parsed["line"] + parsed["reflectivity"].astype(np.float32) / 1e4, rtol=1e-6
        )
        np.testing.assert_array_equal(ring, parsed["line"])
        # PC2 cloud: xyz + ring + explicit 'time' channel (source code 1)
        stamp2, xyz2, t_abs2, intensity2, ring2 = native_msgs[cloud_idx[1]][1]
        parsed2 = py_msgs[cloud_idx[1]][3]
        np.testing.assert_allclose(xyz2[:, 0], parsed2["x"], rtol=1e-6)
        np.testing.assert_array_equal(ring2, parsed2["ring"])
        np.testing.assert_allclose(t_abs2 - stamp2, parsed2["time"] - parsed2["time"].min(), atol=1e-6)
        np.testing.assert_allclose(intensity2, parsed2["intensity"], rtol=1e-6)

    def test_topic_filter_and_errors(self, tmp_path):
        from pointcloud_slam_tpu import native

        bag_path = tmp_path / "m.bag"
        self._make_bag(bag_path)
        with native.NativeBagReader(str(bag_path), lidar_topic="/livox/lidar") as nb:
            kinds = [k for k, _ in nb]
        assert kinds.count("cloud") == 1  # velodyne topic filtered out
        assert kinds.count("imu") == 20
        with pytest.raises(ValueError, match="not a ROS bag"):
            p = tmp_path / "junk.bag"
            p.write_bytes(b"not a bag at all")
            native.NativeBagReader(str(p))


def test_ramp_fallback_uses_actual_scan_gap(tmp_path):
    """A timestamp-less, ring-less PC2 bag at 20 Hz: both readers must ramp
    per-point times over the ACTUAL inter-scan gap (0.05 s), not a
    hard-coded 0.1 s (review regression: the native reader's C++ fallback)."""
    app = _load(os.path.join(REPO, "apps", "run_mapping_offline.py"), "rmo2")
    rng = np.random.default_rng(5)
    p = str(tmp_path / "r.bag")
    t0 = 100.0
    with rosbag.BagWriter(p) as bw:
        for k in range(40):
            bw.write_imu("/imu/data", t0 + 0.005 * k, rng.normal(0, 1, 3), rng.normal(0, 0.1, 3))
        for k in range(3):
            pts = rng.uniform(-5, 5, (200, 3)).astype(np.float32)
            bw.write_pointcloud2("/points", t0 + 0.05 * k,
                                 {"x": pts[:, 0], "y": pts[:, 1], "z": pts[:, 2]})

    class A: pass
    frames = {}
    for reader in ("native", "python"):
        a = A()
        a.bag_file = p; a.lidar_topic = ""; a.imu_topic = ""
        a.n_points = 256; a.n_imu = 32; a.bag_reader = reader
        frames[reader] = list(app.frames_from_bag(a))
    for (fn, tn), (fp_, tp_) in zip(frames["native"], frames["python"]):
        np.testing.assert_allclose(np.asarray(fn.t_offs), np.asarray(fp_.t_offs), atol=1e-6)
    # and the ramp spans the 0.05 s gap, not 0.1 s
    t_offs = np.asarray(frames["native"][0][0].t_offs)
    m = np.asarray(frames["native"][0][0].pt_mask)
    assert 0.04 < t_offs[m].max() <= 0.05 + 1e-6, t_offs[m].max()


def test_native_reader_survives_truncation(tmp_path):
    """Fuzz the native C++ parser: a valid bag truncated at arbitrary byte
    offsets must either open-and-iterate or raise ValueError — never crash
    the process (bounds-check coverage for the C ABI paths)."""
    from pointcloud_slam_tpu import native

    rng = np.random.default_rng(11)
    p = tmp_path / "full.bag"
    with rosbag.BagWriter(str(p)) as bw:
        for k in range(5):
            bw.write_imu("/imu/data", 10.0 + 0.01 * k, rng.normal(0, 1, 3), rng.normal(0, 0.1, 3))
        pts = rng.uniform(-5, 5, (100, 3)).astype(np.float32)
        bw.write_livox("/livox/lidar", 10.02, pts, np.arange(100, dtype=np.uint32))
        bw.write_pointcloud2("/velodyne_points", 10.04,
                             {"x": pts[:, 0], "y": pts[:, 1], "z": pts[:, 2],
                              "time": np.linspace(0, 0.1, 100).astype(np.float32)})
    raw = p.read_bytes()
    cuts = sorted(set(
        list(rng.integers(13, len(raw), 40).tolist()) + [13, len(raw) - 1, len(raw) - 5]
    ))
    for cut in cuts:
        q = tmp_path / "cut.bag"
        q.write_bytes(raw[:cut])
        try:
            with native.NativeBagReader(str(q)) as nb:
                for _kind, _payload in nb:
                    pass
        except ValueError:
            pass  # a clear parse error is an acceptable outcome
