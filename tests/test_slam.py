"""Full SLAM pipeline smoke/behavior test on a synthetic loop trajectory."""

import numpy as np
import jax
import jax.numpy as jnp

from pointcloud_slam_tpu import ops
from pointcloud_slam_tpu.geom import se3, so3
from pointcloud_slam_tpu.io import synthetic
from pointcloud_slam_tpu.models.liosam import slam, scan2map as s2m, backend as bk, scancontext as sc
from pointcloud_slam_tpu.register import ICPConfig, SolverConfig

# one shared config -> one (persistently cached) compile for all SLAM tests
CFG = slam.SLAMConfig(
    backend=bk.BackendConfig(max_keyframes=32, max_loops=4, keyframe_dist_thresh=0.4, gn_iterations=3, pcg_iterations=30),
    n_corner=256,
    n_surf=2048,
    scan2map=s2m.Scan2MapConfig(solver=SolverConfig(max_iterations=8), degeneracy_eig=1.0),
    loop_icp=ICPConfig(solver=SolverConfig(max_iterations=6)),
    scancontext=sc.ScanContextConfig(exclude_recent=3, dist_threshold=0.35),
)


def soa(x):
    return jnp.asarray(np.ascontiguousarray(np.asarray(x).T))


make_feature_world = synthetic.make_feature_world
take_scan = synthetic.take_scan


class TestSLAM:
    def test_odometry_and_keyframes(self):
        cfg = CFG
        corners_w, surfs_w = make_feature_world()
        state = slam.create_state(cfg)
        step = jax.jit(lambda st, c, cm, s, sm: slam.slam_step(cfg, st, c, cm, s, sm))

        # straight-line trajectory
        gt = []
        for k in range(8):
            t = np.array([0.7 * k, 0.0, 1.0], np.float32)
            R = np.eye(3, dtype=np.float32)
            gt.append((R, t))
        errs = []
        t0 = gt[0][1]
        for k, (R, t) in enumerate(gt):
            c, cm = take_scan(corners_w, R, t, cfg.n_corner, seed=k)
            s, sm = take_scan(surfs_w, R, t, cfg.n_surf, seed=100 + k)
            state, out = step(state, soa(c), jnp.asarray(cm), soa(s), jnp.asarray(sm))
            # SLAM's world frame is the first sensor pose
            errs.append(np.linalg.norm(np.asarray(out.pose.t) - (t - t0)))
        assert int(state.graph.n) >= 2
        assert errs[-1] < 0.3, f"odometry drift {errs[-1]}"

    def test_loop_closure_fires_on_revisit(self):
        cfg = CFG
        corners_w, surfs_w = make_feature_world(seed=2)
        state = slam.create_state(cfg)
        step = jax.jit(lambda st, c, cm, s, sm: slam.slam_step(cfg, st, c, cm, s, sm))

        # out-and-back path revisiting the start
        xs = [0.0, 0.5, 1.0, 1.5, 2.0, 2.5, 2.0, 1.5, 1.0, 0.5, 0.02]
        loops = 0
        for k, x in enumerate(xs):
            t = np.array([x, 0.0, 1.0], np.float32)
            R = np.eye(3, dtype=np.float32)
            c, cm = take_scan(corners_w, R, t, cfg.n_corner, seed=k)
            s, sm = take_scan(surfs_w, R, t, cfg.n_surf, seed=100 + k)
            state, out = step(state, soa(c), jnp.asarray(cm), soa(s), jnp.asarray(sm))
            loops += int(out.loop_detected)
        assert loops >= 1, "revisit must trigger at least one verified loop closure"
