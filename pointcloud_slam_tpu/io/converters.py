"""Point-cloud format converters (the L1 normalization layer, host-side numpy).

Behavioral parity targets:
  - `src/tool/livox_repub/src/livox_repub.cpp:13-58`: Livox CustomMsg ->
    XYZINormal with line+reflectivity packed into intensity and relative time
    in curvature,
  - `src/tool/rs_to_velodyne/src/rs_to_velodyne.cpp:12-212`: Robosense ->
    Velodyne XYZIRT with the RING_ID_MAP_RUBY / RING_ID_MAP_16 remaps and NaN
    filtering,
  - `src/tool/hesai_to_velodyne/src/hesai_to_velodyne.cpp`: Hesai XYZIRT ->
    Velodyne XYZIRT (ring remap + time rebase).

All converters take/return plain numpy dicts with keys x, y, z, intensity,
ring, time — the unified XYZIRT contract consumed by the pipelines."""

from __future__ import annotations

from typing import Dict

import numpy as np

# Robosense Ruby (128) -> Velodyne ring remap (rs_to_velodyne.cpp:12)
RING_ID_MAP_RUBY = np.array(
    [3, 66, 33, 96, 11, 74, 41, 104, 19, 82, 49, 112, 27, 90, 57, 120, 35, 98, 1, 64, 43, 106, 9, 72,
     51, 114, 17, 80, 59, 122, 25, 88, 67, 34, 97, 0, 75, 42, 105, 8, 83, 50, 113, 16, 91, 58, 121, 24,
     99, 2, 65, 32, 107, 10, 73, 40, 115, 18, 81, 48, 123, 26, 89, 56, 7, 70, 37, 100, 15, 78, 45, 108,
     23, 86, 53, 116, 31, 94, 61, 124, 39, 102, 5, 68, 47, 110, 13, 76, 55, 118, 21, 84, 63, 126, 29, 92,
     71, 38, 101, 4, 79, 46, 109, 12, 87, 54, 117, 20, 95, 62, 125, 28, 103, 6, 69, 36, 111, 14, 77, 44,
     119, 22, 85, 52, 127, 30, 93, 60], np.int32)

# Robosense 16 -> Velodyne ring remap (rs_to_velodyne.cpp:14)
RING_ID_MAP_16 = np.array([0, 1, 2, 3, 4, 5, 6, 7, 15, 14, 13, 12, 11, 10, 9, 8], np.int32)


def livox_custom_to_xyzirt(x, y, z, reflectivity, line, offset_time_ns) -> Dict[str, np.ndarray]:
    """Livox CustomMsg fields -> unified XYZIRT.

    intensity = line + reflectivity/10000 (livox_repub.cpp:31-33); time in
    seconds relative to the scan start."""
    intensity = line.astype(np.float32) + reflectivity.astype(np.float32) / 10000.0
    return {
        "x": np.asarray(x, np.float32),
        "y": np.asarray(y, np.float32),
        "z": np.asarray(z, np.float32),
        "intensity": intensity,
        "ring": line.astype(np.int32),
        "time": (np.asarray(offset_time_ns, np.float64) * 1e-9).astype(np.float32),
    }


def rs_to_velodyne(cloud: Dict[str, np.ndarray], n_rings: int = 16) -> Dict[str, np.ndarray]:
    """Robosense XYZIRT -> Velodyne XYZIRT: NaN drop, ring remap, time rebase
    (rs_to_velodyne.cpp handler paths)."""
    ok = np.isfinite(cloud["x"]) & np.isfinite(cloud["y"]) & np.isfinite(cloud["z"])
    remap = RING_ID_MAP_RUBY if n_rings == 128 else RING_ID_MAP_16
    ring = remap[np.clip(cloud["ring"][ok].astype(np.int32), 0, len(remap) - 1)]
    t = cloud["time"][ok]
    t = t - (t[0] if len(t) else 0.0)
    return {
        "x": cloud["x"][ok], "y": cloud["y"][ok], "z": cloud["z"][ok],
        "intensity": cloud["intensity"][ok].astype(np.float32),
        "ring": ring, "time": t.astype(np.float32),
    }


def hesai_to_velodyne(cloud: Dict[str, np.ndarray], flip_rings: bool = True) -> Dict[str, np.ndarray]:
    """Hesai XYZIRT -> Velodyne convention: ring order flipped top/bottom,
    absolute stamps rebased to scan start (hesai_to_velodyne.cpp)."""
    ok = np.isfinite(cloud["x"]) & np.isfinite(cloud["y"]) & np.isfinite(cloud["z"])
    ring = cloud["ring"][ok].astype(np.int32)
    if flip_rings and len(ring):
        ring = ring.max() - ring
    t = cloud["time"][ok].astype(np.float64)
    t = (t - (t.min() if len(t) else 0.0)).astype(np.float32)
    return {
        "x": cloud["x"][ok], "y": cloud["y"][ok], "z": cloud["z"][ok],
        "intensity": cloud["intensity"][ok].astype(np.float32),
        "ring": ring, "time": t,
    }


def merge_clouds(clouds, extrinsics=None) -> Dict[str, np.ndarray]:
    """Multi-sensor fusion: concatenate clouds after per-sensor extrinsic
    transforms (integrate_points fusion_lidar_camera role)."""
    outs = {k: [] for k in ("x", "y", "z", "intensity", "ring", "time")}
    for i, c in enumerate(clouds):
        x, y, z = c["x"], c["y"], c["z"]
        if extrinsics is not None:
            R, t = extrinsics[i]
            p = np.stack([x, y, z], 1) @ np.asarray(R).T + np.asarray(t)
            x, y, z = p[:, 0], p[:, 1], p[:, 2]
        outs["x"].append(x)
        outs["y"].append(y)
        outs["z"].append(z)
        outs["intensity"].append(c.get("intensity", np.zeros_like(x)))
        outs["ring"].append(c.get("ring", np.zeros(len(x), np.int32)))
        outs["time"].append(c.get("time", np.zeros_like(x)))
    return {k: np.concatenate(v) for k, v in outs.items()}
