#!/usr/bin/env python
"""Online LIO mapping loop: streaming sensor events -> poses in real time.

Behavioral parity target: `src/jueying_lio/app/run_mapping_online.cc:18-50`
(ROS spin + 5 kHz Run() polling over mutex-guarded buffers) and the
callback/sync layer `laser_mapping.cc:391-518`.

Here the native C++ ingest shim (`native/src/ingest.cpp`) plays the
buffer/sync role: IMU samples stream into its ring buffer at sensor rate;
whenever a scan interval is fully covered by IMU, a fixed-shape frame is
assembled and handed to the jitted LIO step. Poses stream to a callback (the
/Odometry topic role). Works against any event source; a synthetic stream is
built in for demonstration/smoke testing.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np
import jax
import jax.numpy as jnp


class OnlineMapper:
    """The LaserMapping-node role: buffers -> frames -> jitted LIO step."""

    def __init__(self, cfg=None, n_points=4096, n_imu=64, blind=0.3, filter_num=1):
        from pointcloud_slam_tpu import native
        from pointcloud_slam_tpu.models import lio

        self.lio = lio
        self.cfg = cfg or lio.LIOConfig()
        self.state = lio.create_state(self.cfg)
        self.shim = native.IngestShim(n_points, n_imu)
        self.blind = blind
        self.filter_num = filter_num
        self._step = jax.jit(lambda s, f: lio.lio_step(self.cfg, s, f))
        self._pending_scan = None  # (xyz, t_pts, t0, t1)
        self.n_frames = 0

    def push_imu(self, t, acc, gyro):
        self.shim.push_imu(np.atleast_1d(t), np.atleast_2d(acc), np.atleast_2d(gyro))
        return self._try_process()

    def push_scan(self, xyz, t_pts, t0, t1):
        """Queue a scan; processed once IMU covers [t0, t1] (SyncPackages gate)."""
        self._pending_scan = (xyz, t_pts, t0, t1)
        return self._try_process()

    def reset(self):
        """jueying_lio/reset topic semantics: fresh filter + map + IMU init."""
        self.state = self.lio.reset(self.cfg)
        self._pending_scan = None

    def _try_process(self):
        if self._pending_scan is None:
            return None
        xyz, t_pts, t0, t1 = self._pending_scan
        raw = self.shim.make_frame(xyz, t_pts, t0, t1, blind=self.blind, filter_num=self.filter_num)
        if raw is None:
            return None  # IMU not caught up yet
        self._pending_scan = None
        frame = self.lio.LIOFrame(
            pts=jnp.asarray(raw["pts"]),
            pt_mask=jnp.asarray(raw["pt_mask"]),
            t_offs=jnp.asarray(raw["t_offs"]),
            imu_acc=jnp.asarray(raw["imu_acc"]),
            imu_gyro=jnp.asarray(raw["imu_gyro"]),
            imu_dt=jnp.asarray(raw["imu_dt"]),
            imu_offs=jnp.asarray(raw["imu_offs"]),
            imu_mask=jnp.asarray(raw["imu_mask"]),
        )
        self.state, out = self._step(self.state, frame)
        self.n_frames += 1
        return out


def synthetic_stream(n_frames, imu_per_frame=20, frame_dt=0.1, n_pts=2048):
    """Interleaved (imu | scan) events from the synthetic trajectory."""
    from pointcloud_slam_tpu.io import synthetic

    world = synthetic.make_room_cloud(30000, seed=0)
    traj = synthetic.make_imu_trajectory(n_frames, imu_per_frame, frame_dt, seed=0)
    rng = np.random.default_rng(0)
    for f in range(n_frames):
        i0, i1 = f * imu_per_frame, (f + 1) * imu_per_frame
        for i in range(i0, i1):
            yield ("imu", traj["t"][i + 1], traj["acc"][i], traj["gyro"][i])
        pos, R = traj["pos"][i1], traj["R"][i1]
        rel = (world - pos) @ R
        r = np.linalg.norm(rel, axis=1)
        vis = rel[(r < 25.0) & (r > 0.5)]
        idx = rng.choice(len(vis), min(n_pts, len(vis)), replace=False)
        pts = vis[idx].astype(np.float32)
        t1 = traj["t"][i1]
        yield ("scan", pts, np.full(len(pts), t1), traj["t"][i0], t1)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=20)
    p.add_argument("--n_points", type=int, default=2048)
    from pointcloud_slam_tpu.utils import runtime
    runtime.add_platform_arg(p)
    args = p.parse_args()
    runtime.select_platform(args.platform)

    mapper = OnlineMapper(n_points=args.n_points, n_imu=32)
    t_start = time.perf_counter()
    for ev in synthetic_stream(args.frames, n_pts=args.n_points):
        if ev[0] == "imu":
            _, t, acc, gyro = ev
            out = mapper.push_imu(t, acc, gyro)
        else:
            _, pts, t_pts, t0, t1 = ev
            out = mapper.push_scan(pts, t_pts, t0, t1)
        if out is not None:
            pos = np.asarray(out.pos)
            print(f"frame {mapper.n_frames:4d}  pos [{pos[0]:+.3f} {pos[1]:+.3f} {pos[2]:+.3f}]  "
                  f"eff {int(out.num_effective):5d}")
    wall = time.perf_counter() - t_start
    print(f"{mapper.n_frames} frames in {wall:.2f}s ({mapper.n_frames / max(wall, 1e-9):.1f} fps incl. compile)")


if __name__ == "__main__":
    main()
