"""Synthetic LiDAR world / scan / IMU generators for tests and benchmarks.

Plays the role of the reference's shipped fixtures (`fast_gicp/data/` KITTI
PCD pair, rosbag replays): deterministic structured scenes with planar
surfaces so plane-fit based pipelines behave as on real indoor/outdoor data.
Pure numpy on the host — this is the data-feed side, not the compute path.
"""

from __future__ import annotations

import numpy as np


def make_room_cloud(n_points: int, seed: int = 0, size: float = 20.0, noise: float = 0.005) -> np.ndarray:
    """Points sampled on the 6 faces of a box plus a few interior walls.

    Mimics an indoor Livox scan's plane-dominated geometry.
    """
    rng = np.random.default_rng(seed)
    s = size / 2
    # face: (origin, u axis, v axis)
    faces = [
        ((-s, -s, 0.0), (1, 0, 0), (0, 1, 0)),   # floor
        ((-s, -s, 3.0), (1, 0, 0), (0, 1, 0)),   # ceiling
        ((-s, -s, 0.0), (1, 0, 0), (0, 0, 1)),   # wall y=-s
        ((-s, s, 0.0), (1, 0, 0), (0, 0, 1)),    # wall y=+s
        ((-s, -s, 0.0), (0, 1, 0), (0, 0, 1)),   # wall x=-s
        ((s, -s, 0.0), (0, 1, 0), (0, 0, 1)),    # wall x=+s
        ((-s / 2, -s, 0.0), (0, 1, 0), (0, 0, 1)),  # interior wall 1
        ((0.0, 0.0, 0.0), (1, 0, 0), (0, 0, 1)),    # interior wall 2
    ]
    per = n_points // len(faces)
    pts = []
    for k, (o, u, v) in enumerate(faces):
        m = per if k < len(faces) - 1 else n_points - per * (len(faces) - 1)
        uu = rng.uniform(0, size, size=(m, 1))
        vv = rng.uniform(0, 3.0 if u[2] == 0 and v[2] == 1 else size, size=(m, 1))
        vv = np.where(np.asarray(v)[2] == 1, np.clip(vv, 0, 3.0), vv % size)
        p = np.asarray(o) + uu * np.asarray(u) + vv * np.asarray(v)
        pts.append(p)
    cloud = np.concatenate(pts, axis=0)
    cloud = np.clip(cloud, -s, s)
    cloud += rng.normal(scale=noise, size=cloud.shape)
    return cloud.astype(np.float32)


def make_scan_from_world(world: np.ndarray, sensor_pos: np.ndarray, max_range: float = 30.0, seed: int = 0, n_out: int | None = None) -> np.ndarray:
    """Range-gated view of the world from a sensor position, in the SENSOR frame
    (identity orientation). Subsamples to n_out points if given."""
    rng = np.random.default_rng(seed)
    rel = world - sensor_pos[None, :]
    r = np.linalg.norm(rel, axis=1)
    vis = rel[(r < max_range) & (r > 0.3)]
    if n_out is not None:
        idx = rng.choice(len(vis), size=min(n_out, len(vis)), replace=len(vis) < n_out)
        vis = vis[idx]
    return vis.astype(np.float32)


def random_pose(seed: int = 0, rot_scale: float = 0.1, trans_scale: float = 0.5):
    """Small random SE(3) perturbation as (R, t) numpy pair."""
    rng = np.random.default_rng(seed)
    w = rng.normal(size=3)
    w = w / np.linalg.norm(w) * rng.uniform(0, rot_scale)
    t = rng.normal(size=3)
    t = t / np.linalg.norm(t) * rng.uniform(0, trans_scale)
    theta = np.linalg.norm(w)
    K = np.array([[0, -w[2], w[1]], [w[2], 0, -w[0]], [-w[1], w[0], 0]])
    if theta < 1e-12:
        R = np.eye(3)
    else:
        K = K / theta
        R = np.eye(3) + np.sin(theta) * K + (1 - np.cos(theta)) * K @ K
    return R.astype(np.float32), t.astype(np.float32)


def make_imu_trajectory(n_frames: int, imu_per_frame: int = 20, frame_dt: float = 0.1, seed: int = 0, gravity: float = 9.809):
    """Smooth sinusoidal trajectory with exact IMU measurements.

    Returns dict with per-imu-sample times, accel (body frame, includes
    gravity reaction), gyro (body frame), and ground-truth per-sample
    (pos, vel, R). The body never rolls far so gravity stays observable.
    """
    rng = np.random.default_rng(seed)
    n = n_frames * imu_per_frame + 1
    dt = frame_dt / imu_per_frame
    t = np.arange(n) * dt
    # position: smooth curve
    ax_amp = rng.uniform(0.5, 1.5, size=3)
    freq = rng.uniform(0.2, 0.5, size=3)
    phase = rng.uniform(0, 2 * np.pi, size=3)
    pos = ax_amp * np.sin(2 * np.pi * freq * t[:, None] + phase)
    vel = ax_amp * (2 * np.pi * freq) * np.cos(2 * np.pi * freq * t[:, None] + phase)
    acc_w = -ax_amp * (2 * np.pi * freq) ** 2 * np.sin(2 * np.pi * freq * t[:, None] + phase)
    # yaw oscillation only (keeps it simple and exactly integrable)
    yaw_amp, yaw_freq = 0.3, 0.3
    yaw = yaw_amp * np.sin(2 * np.pi * yaw_freq * t)
    yaw_rate = yaw_amp * 2 * np.pi * yaw_freq * np.cos(2 * np.pi * yaw_freq * t)
    cz, sz = np.cos(yaw), np.sin(yaw)
    R = np.zeros((n, 3, 3))
    R[:, 0, 0], R[:, 0, 1] = cz, -sz
    R[:, 1, 0], R[:, 1, 1] = sz, cz
    R[:, 2, 2] = 1.0
    grav_w = np.array([0.0, 0.0, -gravity])
    # IMU: acc_body = R^T (acc_world - grav_w); gyro_body = R^T * omega_world (= [0,0,yaw_rate])
    acc_b = np.einsum("nij,nj->ni", R.transpose(0, 2, 1), acc_w - grav_w)
    gyro_b = np.einsum("nij,nj->ni", R.transpose(0, 2, 1), np.stack([np.zeros(n), np.zeros(n), yaw_rate], axis=1))
    return {
        "t": t.astype(np.float64),
        "acc": acc_b.astype(np.float32),
        "gyro": gyro_b.astype(np.float32),
        "pos": pos.astype(np.float32),
        "vel": vel.astype(np.float32),
        "R": R.astype(np.float32),
        "imu_per_frame": imu_per_frame,
        "frame_dt": frame_dt,
    }
