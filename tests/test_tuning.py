"""Grid auto-tuning (ops/tuning.py): spacing estimate + config suggestion."""

import numpy as np
import jax.numpy as jnp

from pointcloud_slam_tpu import ops
from pointcloud_slam_tpu.io import synthetic
from pointcloud_slam_tpu.ops import tuning


def _scan(n, seed=0):
    world = synthetic.make_room_cloud(40_000, seed=seed)
    rng = np.random.default_rng(seed)
    return world[rng.choice(len(world), size=n, replace=False)].astype(np.float32)


def test_spacing_estimate_grid():
    # a regular grid has a known NN spacing
    g = np.mgrid[0:20, 0:20, 0:3].reshape(3, -1).T.astype(np.float64) * 0.25
    s = tuning.estimate_spacing(g)
    assert abs(s - 0.25) < 1e-6


def test_sparser_scan_coarser_grid():
    dense = _scan(20_000)
    sparse = _scan(1_000)
    cfg_d = tuning.suggest_grid(dense)
    cfg_s = tuning.suggest_grid(sparse)
    assert tuning.estimate_spacing(sparse) > tuning.estimate_spacing(dense)
    assert cfg_s.resolution > cfg_d.resolution
    assert cfg_d.resolution >= 0.2 and cfg_s.resolution <= 2.0
    assert tuning.suggest_grid(sparse, aggressive=True).nearby == 7


def test_suggested_grid_supports_plane_fits():
    # the suggested config must give the 5-NN plane fit enough neighbors for
    # nearly all scan points — on a DECIMATED scan where the dense default
    # (0.4 m) starves the stencil (the failure mode test_oracle_trajectory
    # documents)
    scan = _scan(1_500, seed=3)
    cfg = tuning.suggest_grid(scan, capacity=1 << 14)
    grid = ops.insert(cfg, ops.create(cfg), jnp.asarray(scan.T), jnp.ones(len(scan), bool))
    _, d2, cnt, _ = ops.knn(cfg, grid, jnp.asarray(scan.T), k=5, max_range=3.0 * cfg.resolution)
    frac = float(np.mean(np.asarray(cnt) >= 5))
    # the dense default (0.4 m, faces) measures 13% on this scan; the
    # suggestion must stay above 90% (measured 92% — see suggest_grid doc)
    assert frac > 0.9, f"only {frac:.2%} of points have 5 neighbors (res {cfg.resolution})"
