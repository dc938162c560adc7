"""Feature-based LOAM localization: the new_localization corner+surf path.

Parity target: `src/jueying_slam/src/new_localization.cpp` (:77-2081) runs
projection -> feature extraction -> corner/surf LOAM matching against the
globalCornerMap/globalSurfMap tile products. The decisive behavioral claim
tested here: on a world whose planar structure is translation-degenerate
(a ground plane), surf-only matching CANNOT recover a horizontal offset —
the corner channel (vertical pole edges) is what localizes. This is why the
reference ships both feature families to the localizer.
"""

import numpy as np
import jax.numpy as jnp

from pointcloud_slam_tpu import ops, register
from pointcloud_slam_tpu.geom import se3, so3
from pointcloud_slam_tpu.models.liosam import scan2map as s2m
from pointcloud_slam_tpu.models.localization import pipeline as loc


def _world(seed=0, half=10.0, floor_noise=0.02):
    """Ground plane (surf family) + vertical poles (corner family)."""
    rng = np.random.default_rng(seed)
    floor = np.concatenate(
        [rng.uniform(-half, half, (6000, 2)), floor_noise * rng.standard_normal((6000, 1))], 1
    ).astype(np.float32)
    poles = []
    for _ in range(25):
        px, py = rng.uniform(-half * 0.8, half * 0.8, 2)
        z = np.linspace(0.0, 3.0, 40)[:, None]
        poles.append(np.concatenate([np.full((40, 1), px), np.full((40, 1), py), z], 1))
    corners = np.concatenate(poles).astype(np.float32)
    return corners, floor


def _soa(x):
    return jnp.asarray(np.ascontiguousarray(x.T.astype(np.float32)))


def _channel(world, t, n, seed):
    """Sensor-frame scan channel: world points observed from pose (I, t)."""
    rng = np.random.default_rng(seed)
    rel = world - t
    idx = rng.choice(len(rel), min(n, len(rel)), replace=False)
    out = np.zeros((n, 3), np.float32)
    m = np.zeros(n, bool)
    out[: len(idx)] = rel[idx]
    m[: len(idx)] = True
    return _soa(out), jnp.asarray(m)


class TestFeatureLocalization:
    def test_corner_channel_recovers_degenerate_offset(self):
        corners_w, surfs_w = _world()
        grid = ops.GridConfig(capacity=1 << 13, pts_per_voxel=8, resolution=0.6, nearby=7)
        cfg = loc.LocalizationConfig(
            method="loam",
            scan2map=s2m.Scan2MapConfig(corner_grid=grid, surf_grid=grid),
        )

        def build(cloud):
            g = ops.create(grid)
            pts = _soa(cloud)
            return ops.insert(grid, g, pts, jnp.ones(pts.shape[1], bool))

        corner_map, surf_map = build(corners_w), build(surfs_w)

        t_true = np.array([1.2, -0.8, 1.5], np.float32)
        c, cm = _channel(corners_w, t_true, 512, seed=1)
        s, sm = _channel(surfs_w, t_true, 1024, seed=2)

        # initial guess offset horizontally — the direction the ground plane
        # cannot observe
        init = se3.Pose(jnp.eye(3), jnp.asarray(t_true + np.array([0.5, 0.4, 0.1], np.float32)))

        res_both = loc.localize_loam(cfg, None, corner_map, surf_map, c, cm, s, sm, init)
        err_both = float(jnp.linalg.norm(res_both.pose.t - t_true))
        assert err_both < 0.1, err_both

        # surf-only: empty corner channel (the pre-round-3 run_localization
        # shape). The GN system is degenerate along x/y/yaw; the guard keeps
        # the update out of those directions, so the offset survives.
        no_c = jnp.zeros((3, 8), jnp.float32)
        no_cm = jnp.zeros(8, bool)
        res_surf = loc.localize_loam(cfg, None, corner_map, surf_map, no_c, no_cm, s, sm, init)
        err_xy = float(jnp.linalg.norm(res_surf.pose.t[:2] - t_true[:2]))
        assert err_xy > 0.3, err_xy
        # z IS observable from the plane and should still be corrected
        assert abs(float(res_surf.pose.t[2]) - t_true[2]) < 0.1

        # loss-rate claim: gate fitness on the CORNER structure (the part of
        # the world that moves under the unresolved offset). Feature-based
        # result passes the gate, surf-only fails it.
        def corner_fitness(pose):
            pw = pose.apply(c)
            f, _ = register.fitness_score(grid, corner_map, pw, cm, max_range=1.0)
            return float(f)

        assert corner_fitness(res_both.pose) < cfg.fitness_thresh
        assert corner_fitness(res_surf.pose) > cfg.fitness_thresh

    def test_degeneracy_flag_on_surf_only(self):
        # exact plane: x/y/yaw information must be numerically zero so the
        # eigen guard is exercised (noise-induced pseudo-information on a
        # rough floor can legitimately exceed the threshold)
        corners_w, surfs_w = _world(seed=3, floor_noise=0.0)
        grid = ops.GridConfig(capacity=1 << 13, pts_per_voxel=8, resolution=0.6, nearby=7)
        cfg = loc.LocalizationConfig(
            method="loam",
            scan2map=s2m.Scan2MapConfig(corner_grid=grid, surf_grid=grid),
        )
        g = ops.create(grid)
        pts = _soa(surfs_w)
        surf_map = ops.insert(grid, g, pts, jnp.ones(pts.shape[1], bool))
        corner_map = ops.create(grid)

        t_true = np.array([0.0, 0.0, 1.5], np.float32)
        s, sm = _channel(surfs_w, t_true, 1024, seed=4)
        no_c = jnp.zeros((3, 8), jnp.float32)
        no_cm = jnp.zeros(8, bool)
        init = se3.Pose(jnp.eye(3), jnp.asarray(t_true))
        res = loc.localize_loam(cfg, None, corner_map, surf_map, no_c, no_cm, s, sm, init)
        # plane-only world -> x/y/yaw unobservable -> the LMOptimization
        # degeneracy guard must fire (mapOptmization.cpp:1442-1558)
        assert bool(res.degenerate)
