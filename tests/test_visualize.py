"""apps/visualize_run.py — offline rviz-role artifact renderer."""

import os
import subprocess
import sys

import numpy as np
import jax.numpy as jnp

import pytest

ROOT = os.path.join(os.path.dirname(__file__), "..")


@pytest.fixture(scope="module")
def run_dir(tmp_path_factory):
    """A miniature run_slam_offline-shaped output dir: graph.g2o + Scans/."""
    from pointcloud_slam_tpu.io import pcd as pcdio
    from pointcloud_slam_tpu.models.liosam import backend as bk
    from pointcloud_slam_tpu.utils import checkpoint as ck

    out = tmp_path_factory.mktemp("run")
    KF = 12
    cfg = bk.BackendConfig(max_keyframes=16, max_loops=4)
    g = bk.create(cfg)
    ang = np.linspace(0, 2 * np.pi, KF).astype(np.float32)
    t = np.stack([5 * np.cos(ang), 5 * np.sin(ang), 0 * ang], 1)
    eye = np.broadcast_to(np.eye(3, dtype=np.float32), (16, 3, 3)).copy()
    tt = np.zeros((16, 3), np.float32)
    tt[:KF] = t
    odom_t = np.zeros((16, 3), np.float32)
    odom_t[1:KF] = np.diff(t, axis=0)
    g = g._replace(
        R=jnp.asarray(eye), t=jnp.asarray(tt), n=jnp.asarray(KF, jnp.int32),
        odom_R=jnp.asarray(eye), odom_t=jnp.asarray(odom_t),
        odom_info=jnp.full((16, 6), 1e2, jnp.float32),
        loop_i=jnp.zeros(4, jnp.int32).at[0].set(0),
        loop_j=jnp.zeros(4, jnp.int32).at[0].set(KF - 1),
        loop_R=jnp.broadcast_to(jnp.eye(3), (4, 3, 3)).astype(jnp.float32),
        loop_t=jnp.zeros((4, 3), jnp.float32),
        loop_info=jnp.full((4, 6), 1e3, jnp.float32),
        n_loops=jnp.asarray(1, jnp.int32),
    )
    ck.save_pose_graph_g2o(str(out / "graph.g2o"), g)
    scans = out / "Scans"
    scans.mkdir()
    rng = np.random.default_rng(0)
    for k in range(0, KF, 3):
        pts = rng.normal(0, 1.0, (200, 3)).astype(np.float32)
        pcdio.write_pcd(str(scans / f"{k:06d}.pcd"), pts)
        # real --save_artifacts dirs also hold feature-channel files the
        # renderer must skip
        pcdio.write_pcd(str(scans / f"{k:06d}_corner.pcd"), pts[:20])
    return str(out)


def test_visualize_from_run_dir(run_dir, tmp_path):
    out_png = str(tmp_path / "viz.png")
    r = subprocess.run(
        [sys.executable, os.path.join(ROOT, "apps", "visualize_run.py"),
         "--run_dir", run_dir, "--side", "--out", out_png],
        capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.exists(out_png) and os.path.getsize(out_png) > 10_000
    assert "1 loops" in r.stdout


def test_visualize_with_occupancy(run_dir, tmp_path):
    from pointcloud_slam_tpu.maps import occupancy as occ

    cfg = occ.OccupancyConfig(size=64, resolution=0.25, max_range=10.0)
    grid = occ.create(cfg)
    base = str(tmp_path / "map")
    occ.save_pgm(cfg, grid, base)
    out_png = str(tmp_path / "viz2.png")
    r = subprocess.run(
        [sys.executable, os.path.join(ROOT, "apps", "visualize_run.py"),
         "--run_dir", run_dir, "--map_yaml", base + ".yaml", "--out", out_png],
        capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.exists(out_png)
