"""Native (C++) layer loader: parity oracle + sensor-ingest shim.

Compiles `native/src/*.cpp` with g++ on first use (cached .so under
native/build/) and binds through ctypes — no pybind11 dependency. The oracle
is the correctness reference for the TPU kernels; the ingest shim is the
native host runtime for high-rate sensor framing.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_ROOT, "native", "src")
_BUILD = os.path.join(_ROOT, "native", "build")

_lib: Optional[ctypes.CDLL] = None


def _build() -> str:
    os.makedirs(_BUILD, exist_ok=True)
    out = os.path.join(_BUILD, "libpcs_native.so")
    srcs = [os.path.join(_SRC, f) for f in ("oracle.cpp", "ingest.cpp", "live_driver.cpp", "bagreader.cpp")]
    newest_src = max(os.path.getmtime(s) for s in srcs)
    if not os.path.exists(out) or os.path.getmtime(out) < newest_src:
        cmd = ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", "-o", out] + srcs
        subprocess.run(cmd, check=True, capture_output=True)
    return out


def lib() -> ctypes.CDLL:
    global _lib
    if _lib is None:
        _lib = ctypes.CDLL(_build())
        L = _lib
        dp = ctypes.POINTER(ctypes.c_double)
        fp = ctypes.POINTER(ctypes.c_float)
        ip = ctypes.POINTER(ctypes.c_int32)
        up = ctypes.POINTER(ctypes.c_uint8)
        L.oracle_esti_plane.restype = ctypes.c_int
        L.oracle_esti_plane.argtypes = [dp, ctypes.c_int, ctypes.c_double, dp]
        L.oracle_knn.restype = None
        L.oracle_knn.argtypes = [dp, ctypes.c_int, dp, ctypes.c_int, ctypes.c_int, ctypes.c_double, ip, dp]
        L.oracle_icp_point_to_plane.restype = ctypes.c_int
        L.oracle_icp_point_to_plane.argtypes = [dp, ctypes.c_int, dp, ctypes.c_int, ctypes.c_int, ctypes.c_double, dp, dp]
        L.oracle_eigh3.restype = None
        L.oracle_eigh3.argtypes = [dp, dp]
        L.oracle_scan_to_map_replay.restype = ctypes.c_int
        L.oracle_scan_to_map_replay.argtypes = [
            dp, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_double, ctypes.c_double, ctypes.c_int, dp,
        ]
        L.ingest_create.restype = ctypes.c_void_p
        L.ingest_create.argtypes = [ctypes.c_int, ctypes.c_int]
        L.ingest_destroy.argtypes = [ctypes.c_void_p]
        L.ingest_push_imu.argtypes = [ctypes.c_void_p, dp, fp, fp, ctypes.c_int]
        L.ingest_make_frame.restype = ctypes.c_int
        L.ingest_make_frame.argtypes = [
            ctypes.c_void_p, fp, dp, ctypes.c_int, ctypes.c_double, ctypes.c_double,
            ctypes.c_double, ctypes.c_int, fp, up, fp, fp, fp, fp, fp, up,
        ]
        L.ingest_pending_imu.restype = ctypes.c_int
        L.ingest_pending_imu.argtypes = [ctypes.c_void_p]
        L.live_create.restype = ctypes.c_void_p
        L.live_create.argtypes = [ctypes.c_int, ctypes.c_int, ctypes.c_double,
                                  ctypes.c_double, ctypes.c_int]
        L.live_destroy.argtypes = [ctypes.c_void_p]
        L.live_load_scan.argtypes = [ctypes.c_void_p, fp, dp, ctypes.c_int,
                                     ctypes.c_double, ctypes.c_double]
        L.live_load_imu.argtypes = [ctypes.c_void_p, dp, fp, fp, ctypes.c_int]
        L.live_run.argtypes = [ctypes.c_void_p]
        L.live_pop_frame.restype = ctypes.c_int
        L.live_pop_frame.argtypes = [ctypes.c_void_p, fp, up, fp, fp, fp, fp, fp, up,
                                     ctypes.c_int]
        L.live_queue_depth.restype = ctypes.c_int
        L.live_queue_depth.argtypes = [ctypes.c_void_p]
        L.bag_last_error.restype = ctypes.c_char_p
        L.bag_open.restype = ctypes.c_void_p
        L.bag_open.argtypes = [ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p]
        L.bag_close.argtypes = [ctypes.c_void_p]
        L.bag_num_messages.restype = ctypes.c_int
        L.bag_num_messages.argtypes = [ctypes.c_void_p]
        L.bag_next.restype = ctypes.c_int
        L.bag_next.argtypes = [ctypes.c_void_p]
        L.bag_imu.argtypes = [ctypes.c_void_p, dp, dp, dp]
        L.bag_cloud_size.restype = ctypes.c_int
        L.bag_cloud_size.argtypes = [ctypes.c_void_p]
        L.bag_cloud_stamp.restype = ctypes.c_double
        L.bag_cloud_stamp.argtypes = [ctypes.c_void_p]
        L.bag_cloud_time_source.restype = ctypes.c_int
        L.bag_cloud_time_source.argtypes = [ctypes.c_void_p]
        L.bag_cloud_read.restype = ctypes.c_int
        L.bag_cloud_read.argtypes = [ctypes.c_void_p, fp, dp, fp, ip, ctypes.c_int]
    return _lib


def _dptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def _fptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _iptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def _uptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def esti_plane(pts: np.ndarray, threshold: float = 0.1):
    """Oracle plane fit. pts (N, 3) -> (coef (4,), valid)."""
    pts = np.ascontiguousarray(pts, np.float64)
    coef = np.zeros(4, np.float64)
    ok = lib().oracle_esti_plane(_dptr(pts), len(pts), threshold, _dptr(coef))
    return coef, bool(ok)


def knn(db: np.ndarray, q: np.ndarray, k: int, max_range: float = 1e9):
    db = np.ascontiguousarray(db, np.float64)
    q = np.ascontiguousarray(q, np.float64)
    idx = np.zeros((len(q), k), np.int32)
    d2 = np.zeros((len(q), k), np.float64)
    lib().oracle_knn(_dptr(db), len(db), _dptr(q), len(q), k, max_range, _iptr(idx), _dptr(d2))
    return idx, d2


def icp_point_to_plane(target: np.ndarray, source: np.ndarray, iters: int = 30,
                       max_corr: float = 5.0, R0=None, t0=None):
    target = np.ascontiguousarray(target, np.float64)
    source = np.ascontiguousarray(source, np.float64)
    R = np.ascontiguousarray(R0 if R0 is not None else np.eye(3), np.float64)
    t = np.ascontiguousarray(t0 if t0 is not None else np.zeros(3), np.float64)
    ok = lib().oracle_icp_point_to_plane(
        _dptr(target), len(target), _dptr(source), len(source), iters, max_corr, _dptr(R), _dptr(t)
    )
    return R, t, bool(ok)


def scan_to_map_replay(frames: np.ndarray, iters: int = 15, max_corr: float = 2.0,
                       map_leaf: float = 0.2, max_map: int = 50_000):
    """C++ reference odometry replay (the run_mapping_offline.cc role without
    the IMU): frames (F, N, 3) sensor-frame scans -> (R (F,3,3), t (F,3)).

    Used as the trajectory oracle: the TPU scan-to-map odometry must land
    within tolerance of this trajectory (the BASELINE "ATE within 1% of the
    C++ reference" stand-in until recorded data is wired in)."""
    frames = np.ascontiguousarray(frames, np.float64)
    F, N, _ = frames.shape
    poses = np.zeros((F, 12), np.float64)
    done = lib().oracle_scan_to_map_replay(
        _dptr(frames), F, N, iters, max_corr, map_leaf, max_map, _dptr(poses))
    assert done == F, f"oracle replay stopped at frame {done}"
    R = poses[:, :9].reshape(F, 3, 3)
    t = poses[:, 9:12]
    return R, t


def eigh3(a6: np.ndarray) -> np.ndarray:
    a6 = np.ascontiguousarray(a6, np.float64)
    out = np.zeros(3, np.float64)
    lib().oracle_eigh3(_dptr(a6), _dptr(out))
    return out


class IngestShim:
    """Native frame assembler (the SyncPackages role, C++ side)."""

    def __init__(self, n_points: int, n_imu: int):
        self.n_points = n_points
        self.n_imu = n_imu
        self._h = lib().ingest_create(n_points, n_imu)

    def __del__(self):
        try:
            lib().ingest_destroy(self._h)
        except Exception:
            pass

    def push_imu(self, t: np.ndarray, acc: np.ndarray, gyro: np.ndarray):
        t = np.ascontiguousarray(t, np.float64)
        acc = np.ascontiguousarray(acc, np.float32)
        gyro = np.ascontiguousarray(gyro, np.float32)
        lib().ingest_push_imu(self._h, _dptr(t), _fptr(acc), _fptr(gyro), len(t))

    @property
    def pending_imu(self) -> int:
        return lib().ingest_pending_imu(self._h)

    def make_frame(self, xyz: np.ndarray, t_pts: np.ndarray, t0: float, t1: float,
                   blind: float = 0.1, filter_num: int = 1):
        """Returns a dict of LIOFrame-shaped numpy arrays, or None if IMU does
        not yet cover the scan (retry after more IMU pushes)."""
        xyz = np.ascontiguousarray(xyz, np.float32)
        t_pts = np.ascontiguousarray(t_pts, np.float64)
        NP, NI = self.n_points, self.n_imu
        out = {
            "pts": np.zeros((3, NP), np.float32),
            "pt_mask": np.zeros(NP, np.uint8),
            "t_offs": np.zeros(NP, np.float32),
            "imu_acc": np.zeros((NI, 3), np.float32),
            "imu_gyro": np.zeros((NI, 3), np.float32),
            "imu_dt": np.zeros(NI, np.float32),
            "imu_offs": np.zeros(NI, np.float32),
            "imu_mask": np.zeros(NI, np.uint8),
        }
        n = lib().ingest_make_frame(
            self._h, _fptr(xyz), _dptr(t_pts), len(xyz), t0, t1, blind, filter_num,
            _fptr(out["pts"]), _uptr(out["pt_mask"]), _fptr(out["t_offs"]),
            _fptr(out["imu_acc"]), _fptr(out["imu_gyro"]), _fptr(out["imu_dt"]),
            _fptr(out["imu_offs"]), _uptr(out["imu_mask"]),
        )
        if n < 0:
            return None
        out["pt_mask"] = out["pt_mask"].astype(bool)
        out["imu_mask"] = out["imu_mask"].astype(bool)
        out["n_valid"] = n
        return out


class LiveDriverShim:
    """Native live-driver replay (the thirdparty/livox_ros_driver role).

    Producer threads inside the C++ layer replay a preloaded dataset at
    (scaled) sensor cadence into the Ingest assembler; `pop_frame` is the
    consumer end of the frame queue (the SyncPackages product). See
    native/src/live_driver.cpp.
    """

    def __init__(self, n_points: int, n_imu: int, time_scale: float = 1.0,
                 blind: float = 0.1, filter_num: int = 1):
        self.n_points = n_points
        self.n_imu = n_imu
        self._h = lib().live_create(n_points, n_imu, time_scale, blind, filter_num)

    def __del__(self):
        try:
            lib().live_destroy(self._h)
        except Exception:
            pass

    def load_scan(self, xyz: np.ndarray, t_pts: np.ndarray, t0: float, t1: float):
        xyz = np.ascontiguousarray(xyz, np.float32)
        t_pts = np.ascontiguousarray(t_pts, np.float64)
        lib().live_load_scan(self._h, _fptr(xyz), _dptr(t_pts), len(xyz), t0, t1)

    def load_imu(self, t: np.ndarray, acc: np.ndarray, gyro: np.ndarray):
        t = np.ascontiguousarray(t, np.float64)
        acc = np.ascontiguousarray(acc, np.float32)
        gyro = np.ascontiguousarray(gyro, np.float32)
        lib().live_load_imu(self._h, _dptr(t), _fptr(acc), _fptr(gyro), len(t))

    def run(self):
        lib().live_run(self._h)

    @property
    def queue_depth(self) -> int:
        return lib().live_queue_depth(self._h)

    def pop_frame(self, timeout_ms: int = 1000):
        """Next assembled frame as LIOFrame-shaped numpy arrays; None on
        timeout; False when the replay is finished and drained."""
        NP, NI = self.n_points, self.n_imu
        out = {
            "pts": np.zeros((3, NP), np.float32),
            "pt_mask": np.zeros(NP, np.uint8),
            "t_offs": np.zeros(NP, np.float32),
            "imu_acc": np.zeros((NI, 3), np.float32),
            "imu_gyro": np.zeros((NI, 3), np.float32),
            "imu_dt": np.zeros(NI, np.float32),
            "imu_offs": np.zeros(NI, np.float32),
            "imu_mask": np.zeros(NI, np.uint8),
        }
        n = lib().live_pop_frame(
            self._h, _fptr(out["pts"]), _uptr(out["pt_mask"]), _fptr(out["t_offs"]),
            _fptr(out["imu_acc"]), _fptr(out["imu_gyro"]), _fptr(out["imu_dt"]),
            _fptr(out["imu_offs"]), _uptr(out["imu_mask"]), timeout_ms,
        )
        if n == -1:
            return None
        if n == -2:
            return False
        out["pt_mask"] = out["pt_mask"].astype(bool)
        out["imu_mask"] = out["imu_mask"].astype(bool)
        out["n_valid"] = n
        return out


class NativeBagReader:
    """C++ bag reader (native/src/bagreader.cpp) — the native replay input.

    Iterates the bag's Imu/PointCloud2/CustomMsg messages chronologically:

        with NativeBagReader(path) as bag:
            for kind, payload in bag:
                if kind == "imu":   t, acc, gyro = payload
                else:               stamp, xyz, t_abs, intensity, ring = payload

    Covers uncompressed and lz4-compressed chunks (the replay hot path —
    lz4 is rosbag's common default; decoded by the native LZ4 frame/block
    decoder in bagreader.cpp); bz2 bags raise with a message pointing at
    the pure-Python io.rosbag reader.
    """

    def __init__(self, path: str, lidar_topic: str = "", imu_topic: str = ""):
        self._L = lib()
        self._h = self._L.bag_open(
            path.encode(), lidar_topic.encode(), imu_topic.encode()
        )
        if not self._h:
            raise ValueError(self._L.bag_last_error().decode())

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()

    def close(self):
        if self._h:
            self._L.bag_close(self._h)
            self._h = None

    def __len__(self):
        return self._L.bag_num_messages(self._h)

    def __iter__(self):
        while True:
            kind = self._L.bag_next(self._h)
            if kind == 0:
                return
            if kind == -1:  # undecodable message: skip (the reference's
                continue    # rosbag::View equally skips foreign payloads)
            if kind == 1:
                t = np.zeros(1)
                acc = np.zeros(3)
                gyro = np.zeros(3)
                self._L.bag_imu(self._h, _dptr(t), _dptr(acc), _dptr(gyro))
                yield "imu", (float(t[0]), acc, gyro)
            else:
                n = self._L.bag_cloud_size(self._h)
                stamp = self._L.bag_cloud_stamp(self._h)
                xyz = np.zeros((n, 3), np.float32)
                t_abs = np.zeros(n, np.float64)
                intensity = np.zeros(n, np.float32)
                ring = np.zeros(n, np.int32)
                got = self._L.bag_cloud_read(
                    self._h, _fptr(xyz), _dptr(t_abs), _fptr(intensity), _iptr(ring), n
                )
                assert got == n
                yield "cloud", (stamp, xyz, t_abs, intensity, ring)

    @property
    def cloud_time_source(self) -> int:
        """Per-point time provenance of the LAST cloud (0 ramp, 1 time[s],
        2 t[ns], 3 timestamp[abs s], 4 curvature[ms], 5 livox offset)."""
        return self._L.bag_cloud_time_source(self._h)
