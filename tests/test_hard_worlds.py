"""Harder synthetic worlds: translation-degenerate corridor, doorway
transition, and moving-object outliers, run e2e through slam_step.

Reference machinery under test:
  - LOAM eigenvalue degeneracy guard (mapOptmization.cpp:1508-1536): in a
    featureless corridor the scan-to-map Hessian loses the along-corridor
    direction; the projector must flag it and keep the observable directions
    (lateral/vertical) tight instead of letting the solve explode,
  - doorway transition (localization.cpp:424-476 loss machinery exists for
    exactly this): visible geometry collapses to the aperture, then the
    pipeline must re-converge in the second room,
  - dynamic objects: no explicit filter (the reference has none either) —
    the gate is that plane-fit validity + robust weighting keep the pose
    from latching onto a moving cluster.

One shared config -> one slam_step compile for the whole file (1-core box).
"""

import numpy as np
import jax
import jax.numpy as jnp

from pointcloud_slam_tpu.io import synthetic
from pointcloud_slam_tpu.models.liosam import slam, scan2map as s2m, backend as bk, scancontext as sc
from pointcloud_slam_tpu.register import NDTConfig, SolverConfig

CFG = slam.SLAMConfig(
    backend=bk.BackendConfig(max_keyframes=32, max_loops=4, keyframe_dist_thresh=0.4,
                             gn_iterations=3, pcg_iterations=30),
    n_corner=256,
    n_surf=1024,
    scan2map=s2m.Scan2MapConfig(solver=SolverConfig(max_iterations=8), degeneracy_eig=1.0),
    loop_ndt=NDTConfig(solver=SolverConfig(max_iterations=10)),
    scancontext=sc.ScanContextConfig(dist_threshold=-1.0),  # loops off: odometry stress only
    rs_loop=False,
)

STEP = jax.jit(lambda st, c, cm, s, sm: slam.slam_step(CFG, st, c, cm, s, sm))


def soa(x):
    return jnp.asarray(np.ascontiguousarray(np.asarray(x).T))


def run_seq(scans):
    """scans: list of (corner_pts, corner_mask, surf_pts, surf_mask) numpy."""
    state = slam.create_state(CFG)
    outs = []
    for c, cm, s, sm in scans:
        state, out = STEP(state, soa(c), jnp.asarray(cm), soa(s), jnp.asarray(sm))
        outs.append(out)
    return state, outs


def test_corridor_degeneracy_guard():
    """Driving down a featureless corridor: the along-corridor direction is
    unobservable. The degeneracy flag must fire inside, the estimate must
    FREEZE x rather than hallucinate motion, the observable directions must
    stay tight, and nothing may go NaN.

    World note: junction_gap separates the wall/floor edges — a mixed edge
    neighborhood is plane-fit-degenerate and yields an arbitrary normal
    whose spurious x component lifts H_xx to ~28 (measured; same artifact
    as the reference's esti_plane), which is indistinguishable from a
    feature-rich world's min eigenvalue (27.5 measured). With the gap the
    corridor's H_xx is honest (~0) and the flag is meaningful."""
    corners_w, surfs_w = synthetic.make_corridor_world(length=40.0, n_poles=0, seed=0)
    R = np.eye(3, dtype=np.float32)
    xs = 1.0 + 0.45 * np.arange(16)              # 1.0 -> 7.75 m down the corridor
    scans, gt = [], []
    for k, x in enumerate(xs):
        t = np.array([x, 0.0, 1.2], np.float32)
        c, cm = synthetic.take_scan(corners_w, R, t, CFG.n_corner, seed=k)
        s, sm = synthetic.take_scan(surfs_w, R, t, CFG.n_surf, seed=100 + k)
        scans.append((c, cm, s, sm))
        gt.append(t)
    state, outs = run_seq(scans)

    degen = [bool(o.degenerate) for o in outs]
    assert any(degen[2:]), f"corridor frames must trip the degeneracy guard: {degen}"
    t_est = np.stack([np.asarray(o.pose.t) for o in outs])
    assert np.isfinite(t_est).all()
    gt_rel = np.stack(gt) - gt[0]
    # x is unobservable: the projector must freeze it (no hallucinated
    # forward motion), not track the true 6.75 m advance
    assert abs(t_est[-1, 0]) < 0.5 * gt_rel[-1, 0], (
        f"x should freeze in a featureless corridor, est {t_est[-1, 0]} vs gt {gt_rel[-1, 0]}")
    lat_err = np.abs(t_est[:, 1:] - gt_rel[:, 1:]).max()
    assert lat_err < 0.25, f"lateral/vertical drift {lat_err} despite planes in view"
    # and the rotation stays near identity (roll/pitch/yaw all observable)
    R_last = np.asarray(outs[-1].pose.R)
    assert np.abs(R_last - np.eye(3)).max() < 0.1


def test_doorway_transition_recovers():
    """Crossing a doorway tunnel through a thick wall: the visible world
    collapses to the tunnel interior + two aperture slivers, then room B's
    features take over. The pipeline must stay finite and re-localize
    tightly in room B."""
    corners_w, surfs_w, doors = synthetic.make_doorway_world(seed=1)
    th = doors[1][0]
    R = np.eye(3, dtype=np.float32)
    xs = np.concatenate([
        np.linspace(-3.0, -0.5, 5),          # approach in room A
        np.linspace(-0.1, th + 0.1, 4),      # inside the tunnel
        np.linspace(th + 0.7, th + 3.0, 5),  # into room B
    ])
    # the tunnel frames must be a REAL visibility collapse: probe the world
    # directly (unique visible points, not the padded scan)
    vis_counts = []
    for x in (-3.0, th / 2, th + 3.0):
        _, m = synthetic.take_scan_occluded(
            surfs_w, R, np.array([x, 0.0, 1.2], np.float32), len(surfs_w), doors, seed=0)
        vis_counts.append(int(m.sum()))
    assert vis_counts[1] < 0.5 * min(vis_counts[0], vis_counts[2]), (
        f"tunnel must collapse visibility: {vis_counts}")

    scans, gt = [], []
    for k, x in enumerate(xs):
        t = np.array([x, 0.0, 1.2], np.float32)
        c, cm = synthetic.take_scan_occluded(corners_w, R, t, CFG.n_corner, doors, seed=k)
        s, sm = synthetic.take_scan_occluded(surfs_w, R, t, CFG.n_surf, doors, seed=100 + k)
        scans.append((c, cm, s, sm))
        gt.append(t)
    state, outs = run_seq(scans)
    t_est = np.stack([np.asarray(o.pose.t) for o in outs])
    assert np.isfinite(t_est).all()
    gt_rel = np.stack(gt) - gt[0]
    final_err = np.linalg.norm(t_est[-1] - gt_rel[-1])
    assert final_err < 0.4, f"failed to re-localize after the doorway: {final_err}"


def test_moving_object_outliers():
    """A pedestrian-sized cluster sweeping through the scene must not drag
    the pose estimate: error with the outliers stays close to the clean
    run's error.

    Calibration note (measured on this config): drag is roughly
    proportional to the outlier fraction — 48/1024 points (4.7%, a
    realistic pedestrian share of a scan) gives 0.135 m after 4 m of
    travel; 120/1024 (12%) gives 0.47 m. The reference has no dynamic
    filter either (the object enters its map exactly the same way); the
    gate here is bounded proportional drag, not immunity."""
    N_OBJ = 48
    corners_w, surfs_w = synthetic.make_feature_world(seed=2)
    R = np.eye(3, dtype=np.float32)
    xs = 0.4 * np.arange(11)

    def build(with_object):
        scans, gt = [], []
        for k, x in enumerate(xs):
            t = np.array([x, 0.0, 1.0], np.float32)
            c, cm = synthetic.take_scan(corners_w, R, t, CFG.n_corner, seed=k)
            s, sm = synthetic.take_scan(surfs_w, R, t, CFG.n_surf, seed=100 + k)
            if with_object:
                obj_w = synthetic.moving_object_points(0.5 * k, n=N_OBJ, seed=7)
                obj_s = (obj_w - t) @ R   # world -> sensor
                s[-N_OBJ:] = obj_s
                sm[-N_OBJ:] = True
            scans.append((c, cm, s, sm))
            gt.append(t)
        return scans, np.stack(gt)

    scans_clean, gt = build(False)
    scans_dirty, _ = build(True)
    _, outs_clean = run_seq(scans_clean)
    _, outs_dirty = run_seq(scans_dirty)
    gt_rel = gt - gt[0]
    err = lambda outs: np.linalg.norm(np.asarray(outs[-1].pose.t) - gt_rel[-1])
    e_clean, e_dirty = err(outs_clean), err(outs_dirty)
    assert np.isfinite(e_dirty)
    assert e_dirty < max(3.0 * e_clean, 0.2), (
        f"moving object dragged the estimate: clean {e_clean:.3f} vs dirty {e_dirty:.3f}")
