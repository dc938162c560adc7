"""Full LIO-SAM style SLAM: scan-to-map odometry + keyframes + dual-channel
loop closure + pose-graph optimization + map correction, one jitted step.

Behavioral parity target (the mapOptimization node's main loop):
  reference `src/jueying_slam/src/mapOptmization.cpp`
  - `laserCloudInfoHandler` (:356-405): per-frame scan-to-map matching
    against the surrounding-keyframe local map,
  - `saveKeyFramesAndFactor` (:1779-1884): motion-gated keyframe creation,
    odometry factor, optional IMU preintegration factor
    (imuPreintegration.cpp:243-438) and GPS factor with the reference's
    gating (`addGPSFactor` :1678-1754: covariance gate + 5 m spacing),
  - TWO loop channels, as in the reference:
    * RS: radius search over z-flattened keyposes
      (`detectLoopClosureDistance` :843-880) verified by NDT
      (`performLoopClosure` :683-731) with a plain diagonal noise,
    * SC: ScanContext candidate (`performSCLoopClosure` :735-841) verified by
      ICP with a **Cauchy-robust** noise model (:822-835) — realized as the
      backend's IRLS robust weight,
  - `correctPoses` (:1886-1917): after optimization all keyframe poses are
    rewritten and the local map is rebuilt from corrected keyframes (the
    reference's laserCloudMapContainer cache is a rebuild too).

TPU design: the keyframe cloud store is a fixed (KF, 3, N) array; the local
map rebuild gathers the surrounding W keyframes, transforms them by their
corrected poses, and re-inserts in ONE scatter — no per-keyframe host loop.
The loop "thread" runs at keyframe rate AND at a fixed frame cadence
(`loop_detect_every`, the reference's 1 Hz thread), and the full-graph solve
on loop events is deferred: one GN sweep per frame (`deferred_loop_solve`),
bounding the per-frame stall the way the reference's loop-thread + iSAM2
split does (mapOptmization.cpp:592-605,1835-1850,2041).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ... import ops, register
from ...geom import se3, so3
from ..lio import preintegration as pre
from . import backend as bk
from . import scan2map as s2m
from . import scancontext as sc


@dataclasses.dataclass(frozen=True)
class SLAMConfig:
    scan2map: s2m.Scan2MapConfig = dataclasses.field(default_factory=s2m.Scan2MapConfig)
    scancontext: sc.ScanContextConfig = dataclasses.field(default_factory=sc.ScanContextConfig)
    backend: bk.BackendConfig = dataclasses.field(default_factory=lambda: bk.BackendConfig(max_keyframes=512, max_loops=64))
    loop_icp: register.ICPConfig = dataclasses.field(
        default_factory=lambda: register.ICPConfig(solver=register.SolverConfig(max_iterations=15))
    )
    loop_ndt: register.NDTConfig = dataclasses.field(
        default_factory=lambda: register.NDTConfig(solver=register.SolverConfig(max_iterations=15))
    )
    loop_fitness_thresh: float = 0.3   # historyKeyframeFitnessScore
    local_window: int = 16             # keyframes rebuilt into the local map
    # spatial surrounding-keyframe extraction (extractNearby :1153-1181):
    # the rebuild set is the `local_window` keyposes nearest the current pose
    # within `surrounding_radius`, with the `local_recent` most recent
    # keyframes always included (the reference's 10 s time window role)
    surrounding_radius: float = 50.0   # surroundingKeyframeSearchRadius [m]
    local_recent: int = 6
    n_corner: int = 512                # stored corner points per keyframe
    n_surf: int = 2048                 # stored surf points per keyframe
    loop_grid: ops.GridConfig = dataclasses.field(
        default_factory=lambda: ops.GridConfig(capacity=1 << 14, pts_per_voxel=8, resolution=0.5, nearby=7)
    )
    # loop verification submap: the candidate keyframe +/- this many
    # neighbors merged in the candidate's frame (loopFindNearKeyframes
    # :650-651,972 — the reference merges +/-25; clouds here are already
    # downsampled keyframe stores, so a narrower static window suffices)
    loop_submap_half: int = 4
    # RS loop channel (detectLoopClosureDistance :843-880)
    rs_loop: bool = True
    rs_radius: float = 10.0            # historyKeyframeSearchRadius
    rs_exclude_recent: int = 30        # index-gap guard in addition to the time gate
    rs_time_gate: float = 30.0         # historyKeyframeSearchTimeDiff [s]
    rs_verify: str = "ndt"             # reference verifies RS loops with pclomp NDT
    # incremental backend: run the sliding-window solve on every keyframe
    # (the iSAM2 update role); the full batch solve runs only on loop events
    window_update: bool = True
    window: int = 32
    # Deferred loop-event solve (the reference's thread split: loop closures
    # are absorbed through incremental iSAM2 updates on the mapping thread
    # while it keeps matching, mapOptmization.cpp:592-605,1835-1850,2041).
    # On a loop event the full-graph solve is NOT run inline; instead
    # `loop_solve_sweeps` single-GN sweeps (relinearize + chain-preconditioned
    # PCG) run one-per-frame over the following frames. Each sweep applies the
    # latest-keyframe pose delta to the odometry pose and rebuilds the local
    # maps, so matching stays consistent with the partially-corrected graph.
    # Per-frame stall is bounded by ONE sweep (~95 ms at 5k keyframes vs
    # 763 ms for the inline 8-sweep solve).
    deferred_loop_solve: bool = True
    loop_solve_sweeps: int = 0         # 0 -> backend.gn_iterations (x slice factor)
    # Drain PCG slice: each deferred sweep runs this many PCG iterations
    # instead of backend.pcg_iterations, with proportionally MORE sweeps
    # queued (same total Krylov work, smaller per-frame stall — a sliced
    # sweep at 5k keyframes is ~27 ms device vs ~50 for the 48-iteration
    # sweep, tools/probe_backend_sweep.py). DEFAULT OFF: on the CLOSED-LOOP
    # product shape the slice destabilizes the pipeline — each extra sweep
    # applies another partial pose correction + map rebuild that scan-to-map
    # must re-track mid-drain, and the measured KF=512 revisit DIVERGES
    # (err 0.01 -> 13 m -> NaN; bisected: divergence follows the slice, not
    # the solver — the same total Krylov budget in 3 contiguous-24 sweeps is
    # stable). The solver-level equivalence on a STATIC graph holds
    # (test_backend_oracle.py::TestSlicedSweeps); the interaction with
    # concurrent keyframe creation is what breaks. Use only for offline
    # post-processing of very large graphs where matching is not running.
    loop_solve_pcg_slice: int = 0
    # Skip the local-map rebuild after a deferred sweep whose accumulated
    # node movement since the last rebuild is below this [m]. DEFAULT OFF
    # (0 = rebuild every sweep): even a 2 cm gate measurably degrades the
    # revisit accuracy (0.01 -> 0.11 m final err) — mid-drain matching is
    # sensitive to pose/map inconsistency well below the voxel resolution.
    map_rebuild_min_delta: float = 0.0
    # Fixed-cadence loop detection (the reference's 1 Hz loop thread runs
    # regardless of keyframe creation, mapOptmization.cpp:592-605): every
    # `loop_detect_every` frames the detectors re-run against the LATEST
    # keyframe even when no new keyframe was created — so a robot pausing
    # inside a revisit (motion gate never trips) still closes the loop once
    # the RS time gate opens. 0 disables; a keyframe that already produced a
    # loop factor is not re-closed (the loopIndexContainer role).
    loop_detect_every: int = 8
    # Closure rate limit: after a loop factor is ACCEPTED, detection pauses
    # for this many frames (~the reference's loopClosureFrequency=1 Hz loop
    # thread, mapOptmization.cpp:592-605 — it closes at most ~1/s while the
    # mapping thread absorbs the correction). Without it a long revisit
    # closes at keyframe rate (~10 Hz): slightly-off verifications then
    # accumulate faster than the deferred sweeps re-stabilize the graph and
    # the trajectory death-spirals (measured in the config-6 revisit bench:
    # perfect for 13 frames of 1-per-keyframe closures, then divergence).
    # Also saves the NDT/ICP verification cost during the cooldown.
    loop_cooldown: int = 8
    # nominal scan period [s]: synthesizes the clock (frame_idx * period)
    # when the caller supplies no timestamps, so the RS loop 30 s time gate
    # stays meaningful on dense keyframes instead of falling back to the
    # 30-index gap alone
    nominal_scan_period: float = 0.1
    # GPS gating (addGPSFactor :1678-1754)
    gps_cov_thresh: float = 2.0        # gpsCovThreshold
    gps_dist: float = 5.0              # minimum spacing between GPS factors [m]
    use_gps_elevation: bool = False    # useGpsElevation


class SLAMState(NamedTuple):
    graph: bk.PoseGraph
    corner_map: ops.VoxelHashMap
    surf_map: ops.VoxelHashMap
    kf_corner: jnp.ndarray       # (KF, 3, Nc)
    kf_corner_mask: jnp.ndarray  # (KF, Nc)
    kf_surf: jnp.ndarray         # (KF, 3, Ns)
    kf_surf_mask: jnp.ndarray    # (KF, Ns)
    sc_descs: jnp.ndarray        # (KF, R, S)
    sc_keys: jnp.ndarray         # (KF, R)
    pose: se3.Pose               # current odometry pose
    n_loops_found: jnp.ndarray
    last_gps: jnp.ndarray        # (3,) position of the last added GPS factor
    kf_time: jnp.ndarray         # (KF,) keyframe timestamps [s] (RS loop time gate)
    time: jnp.ndarray            # () current time [s]
    frame_idx: jnp.ndarray       # () int32 frames seen (cadence + synthesized clock)
    opt_sweeps: jnp.ndarray      # () int32 remaining deferred full-solve GN sweeps
    loop_closed_kf: jnp.ndarray  # () int32 latest keyframe already holding a loop factor
    last_loop_frame: jnp.ndarray  # () int32 frame of the last ACCEPTED closure (cooldown)
    map_stale_m: jnp.ndarray     # () accumulated node movement since the last
    # local-map rebuild [m] — the rebuild-skip gate compares against the
    # TOTAL, so skipped sub-threshold sweeps can never accumulate into a
    # stale map beyond map_rebuild_min_delta (a per-sweep gate let ~2 cm per
    # sweep compound past the baked grids' capture basin and lose tracking)


class SLAMOutput(NamedTuple):
    pose: se3.Pose
    is_keyframe: jnp.ndarray
    loop_detected: jnp.ndarray
    loop_index: jnp.ndarray
    degenerate: jnp.ndarray
    num_surf_matches: jnp.ndarray
    opt_pending: jnp.ndarray     # () int32 deferred solve sweeps still queued


def create_state(cfg: SLAMConfig, dtype=jnp.float32) -> SLAMState:
    KF = cfg.backend.max_keyframes
    R, S = cfg.scancontext.num_ring, cfg.scancontext.num_sector
    return SLAMState(
        graph=bk.create(cfg.backend, dtype),
        corner_map=ops.create(cfg.scan2map.corner_grid, dtype),
        surf_map=ops.create(cfg.scan2map.surf_grid, dtype),
        kf_corner=jnp.zeros((KF, 3, cfg.n_corner), dtype),
        kf_corner_mask=jnp.zeros((KF, cfg.n_corner), bool),
        kf_surf=jnp.zeros((KF, 3, cfg.n_surf), dtype),
        kf_surf_mask=jnp.zeros((KF, cfg.n_surf), bool),
        sc_descs=jnp.zeros((KF, R, S), dtype),
        sc_keys=jnp.zeros((KF, R), dtype),
        pose=se3.identity(dtype),
        n_loops_found=jnp.zeros((), jnp.int32),
        last_gps=jnp.full((3,), 1.0e9, dtype),
        kf_time=jnp.zeros((KF,), dtype),
        time=jnp.full((), -1.0, dtype),  # -1 sentinel: no timestamps supplied
        frame_idx=jnp.zeros((), jnp.int32),
        opt_sweeps=jnp.zeros((), jnp.int32),
        loop_closed_kf=jnp.full((), -1, jnp.int32),
        last_loop_frame=jnp.full((), -(1 << 30), jnp.int32),
        map_stale_m=jnp.zeros((), dtype),
    )


def deferred_sweep_plan(cfg: SLAMConfig):
    """(n_sweeps, pcg_iterations_per_sweep) of the deferred loop-event solve:
    with a PCG slice, proportionally more sweeps at the sliced budget (same
    total Krylov work, bounded per-frame stall); None = full budget."""
    slice_ = cfg.loop_solve_pcg_slice
    if slice_ > 0 and slice_ < cfg.backend.pcg_iterations:
        factor = -(-cfg.backend.pcg_iterations // slice_)  # ceil
        pcg = slice_
    else:
        factor, pcg = 1, None
    n = cfg.loop_solve_sweeps if cfg.loop_solve_sweeps > 0 else cfg.backend.gn_iterations * factor
    return n, pcg


def grow_state(cfg: SLAMConfig, state: SLAMState,
               max_keyframes: Optional[int] = None,
               max_loops: Optional[int] = None):
    """HOST-side keyframe-store growth (see backend.grow): re-pads the pose
    graph AND the per-keyframe feature/SC/time stores to a larger capacity.
    Returns `(new_cfg, new_state)` — the new config is a fresh jit key (one
    recompile per doubling). Apps call this when `needs_growth` trips, giving
    the unbounded-trajectory behavior of the reference's disk-backed keyframe
    store (mapOptmization.cpp:249-263,1868-1880) with memory as the only
    bound. Existing keyframes are bit-identical after growth."""
    new_bk_cfg, new_graph = bk.grow(cfg.backend, state.graph, max_keyframes, max_loops)
    new_cfg = dataclasses.replace(cfg, backend=new_bk_cfg)
    KF = new_bk_cfg.max_keyframes

    def pad_to(old, KF_new):
        new_shape = (KF_new,) + old.shape[1:]
        blank = jnp.zeros(new_shape, old.dtype)
        return blank.at[: old.shape[0]].set(old)

    return new_cfg, state._replace(
        graph=new_graph,
        kf_corner=pad_to(state.kf_corner, KF),
        kf_corner_mask=pad_to(state.kf_corner_mask, KF),
        kf_surf=pad_to(state.kf_surf, KF),
        kf_surf_mask=pad_to(state.kf_surf_mask, KF),
        sc_descs=pad_to(state.sc_descs, KF),
        sc_keys=pad_to(state.sc_keys, KF),
        kf_time=pad_to(state.kf_time, KF),
    )


def needs_growth(cfg: SLAMConfig, state: SLAMState, margin: int = 4) -> bool:
    """HOST-side capacity check (one scalar readback): True when the keyframe
    or loop store is within `margin` of saturation. At saturation the stores
    freeze safely (no corruption — add_keyframe/add_loop are strict no-ops),
    so growth ahead of the margin keeps mapping truly unbounded."""
    g = state.graph
    return bool(
        (int(g.n) >= cfg.backend.max_keyframes - margin)
        | (int(g.n_loops) >= cfg.backend.max_loops - margin)
    )


def _rebuild_maps(cfg: SLAMConfig, state: SLAMState, graph: bk.PoseGraph, pose_t):
    """Local maps from the surrounding-keyframe set at their (corrected) poses.

    Spatial extraction parity (extractNearby, mapOptmization.cpp:1153-1181):
    the `local_window` keyposes nearest `pose_t` within `surrounding_radius`,
    with the `local_recent` newest keyframes force-included (the 10 s window
    role) — so on a revisit the OLD spatially-near keyframes re-enter the
    local map with their corrected geometry. One transform + one insert per
    feature family."""
    KF = cfg.backend.max_keyframes
    W = min(cfg.local_window, KF)
    n = graph.n
    all_idx = jnp.arange(KF)
    act_all = all_idx < n
    d2 = jnp.sum((graph.t - pose_t[None, :]) ** 2, axis=1)
    recent = all_idx >= (n - cfg.local_recent)
    in_radius = d2 < cfg.surrounding_radius ** 2
    BIG = jnp.asarray(3.0e38, d2.dtype)
    score = jnp.where(act_all & recent, d2 - BIG * 0.5, jnp.where(act_all & in_radius, d2, BIG))
    neg_best, idx = jax.lax.top_k(-score, W)
    act = -neg_best < BIG
    idx = jnp.minimum(idx, KF - 1)

    def gather_tf(clouds, masks):
        c = clouds[idx]            # (W, 3, N)
        m = masks[idx] & act[:, None]
        Rk = graph.R[idx]          # (W, 3, 3)
        tk = graph.t[idx]
        world = jnp.einsum("wij,wjn->win", Rk, c) + tk[:, :, None]
        W_, _, N = world.shape
        return world.transpose(1, 0, 2).reshape(3, W_ * N), m.reshape(-1)

    cpts, cmask = gather_tf(state.kf_corner, state.kf_corner_mask)
    spts, smask = gather_tf(state.kf_surf, state.kf_surf_mask)
    corner_map = ops.insert(cfg.scan2map.corner_grid, ops.create(cfg.scan2map.corner_grid, cpts.dtype), cpts, cmask)
    surf_map = ops.insert(cfg.scan2map.surf_grid, ops.create(cfg.scan2map.surf_grid, spts.dtype), spts, smask)
    return corner_map, surf_map


def _rs_detect(cfg: SLAMConfig, graph: bk.PoseGraph, kf_time, now, pose_t):
    """RS loop candidate: nearest OLD keypose within rs_radius on the
    z-flattened 2-D keyposes (detectLoopClosureDistance :843-880), gated by
    the reference's 30 s time difference (historyKeyframeSearchTimeDiff) plus
    an index-gap guard."""
    KF = cfg.backend.max_keyframes
    idx = jnp.arange(KF)
    d2 = jnp.sum((graph.t[:, :2] - pose_t[:2][None, :]) ** 2, axis=1)
    # slam_step always supplies a clock (caller stamps, or the synthesized
    # frame_idx * nominal_scan_period fallback); now<0 only for direct
    # callers that pass the create_state -1 sentinel untouched
    time_ok = (now < 0) | ((now - kf_time) > cfg.rs_time_gate)
    eligible = (idx < (graph.n - cfg.rs_exclude_recent)) & time_ok
    d2 = jnp.where(eligible, d2, 3.0e38)
    j = jnp.argmin(d2).astype(jnp.int32)
    found = d2[j] < cfg.rs_radius ** 2
    return jnp.where(found, j, -1), found


def _verify_loop(cfg: SLAMConfig, state: SLAMState, j, pose, surf_pts, surf_mask, yaw, method: str):
    """Register the current scan against the candidate's merged submap.

    Submap parity (loopFindNearKeyframes, mapOptmization.cpp:650-651,972):
    keyframes j-half..j+half are transformed into j's frame and merged as the
    registration target — single-cloud verification is too noisy on sparse
    keyframes. Returns (rel pose j<-current, fitness, converged)."""
    dtype = surf_pts.dtype
    KF = cfg.backend.max_keyframes
    half = cfg.loop_submap_half
    Rj, tj = state.graph.R[j], state.graph.t[j]
    offs = jnp.arange(-half, half + 1)
    ks_raw = j + offs
    ks = jnp.clip(ks_raw, 0, KF - 1)
    k_act = (ks_raw >= 0) & (ks_raw < state.graph.n)
    c = state.kf_surf[ks]                     # (2h+1, 3, Ns)
    m = state.kf_surf_mask[ks] & k_act[:, None]
    Rk, tk = state.graph.R[ks], state.graph.t[ks]
    # p_j = Rj^T (Rk p + tk - tj): neighbor clouds expressed in j's frame
    Rrel = jnp.einsum("ab,kac->kbc", Rj, Rk)   # Rj^T Rk per keyframe
    trel = jnp.einsum("ab,ka->kb", Rj, tk - tj[None, :])
    cj = jnp.einsum("kij,kjn->kin", Rrel, c) + trel[:, :, None]
    S_, _, Ns = cj.shape
    tgt = cj.transpose(1, 0, 2).reshape(3, S_ * Ns)
    tgt_m = m.reshape(-1)
    # init: current pose expressed in the matched keyframe's frame,
    # with the SC yaw as the initial rotation guess
    R_rel = Rj.T @ pose.R
    t_rel = Rj.T @ (pose.t - tj)
    R_yaw = so3.exp(jnp.asarray([0.0, 0.0, 1.0], dtype) * (-yaw))
    init = se3.Pose(R_yaw @ R_rel, t_rel)
    loop_map = ops.insert(cfg.loop_grid, ops.create(cfg.loop_grid, dtype), tgt, tgt_m)
    if method == "ndt":
        gmap = register.ndt.build_target(cfg.loop_ndt, tgt, tgt_m, capacity=cfg.loop_grid.capacity)
        res = register.ndt.align(gmap[0], gmap[1], surf_pts, surf_mask, init, cfg=cfg.loop_ndt)
        pose_rel, conv = res.pose, res.converged
    else:
        res = register.point_to_plane_icp(cfg.loop_grid, loop_map, surf_pts, surf_mask, init, cfg=cfg.loop_icp)
        pose_rel, conv = res.pose, res.converged
    pw = pose_rel.apply(surf_pts)
    fitness, _ = register.fitness_score(cfg.loop_grid, loop_map, pw, surf_mask, max_range=1.0)
    return pose_rel, fitness, conv


@functools.partial(jax.jit, static_argnames=("cfg",))
def slam_step(
    cfg: SLAMConfig,
    state: SLAMState,
    corner_pts: jnp.ndarray,   # (3, Nc) sensor frame
    corner_mask: jnp.ndarray,
    surf_pts: jnp.ndarray,     # (3, Ns)
    surf_mask: jnp.ndarray,
    odom_guess: Optional[se3.Pose] = None,  # e.g. IMU/LIO incremental pose
    pim: Optional[pre.PreintegratedImu] = None,  # IMU preintegration since last keyframe
    vel_guess: Optional[jnp.ndarray] = None,     # (3,) velocity estimate for the new node
    gps_pos: Optional[jnp.ndarray] = None,       # (3,) GPS position measurement
    gps_cov: Optional[jnp.ndarray] = None,       # (3,) GPS covariance diagonal
    gps_valid: Optional[jnp.ndarray] = None,     # () bool
    time_sec: Optional[jnp.ndarray] = None,      # () scan time [s] (RS loop time gate).
    # NB: must be SMALL (relative to the run start) — state arrays are
    # float32, whose ULP at ROS-epoch magnitudes (~1.7e9 s) is 128 s; rebase
    # absolute stamps in float64 on the host (run_slam_offline does).
):
    dtype = surf_pts.dtype
    # clock: caller timestamps when supplied, else frame_idx * nominal period
    # (keeps the RS 30 s time gate meaningful on dense keyframes)
    if time_sec is not None:
        now = jnp.asarray(time_sec, dtype)
    else:
        now = state.frame_idx.astype(dtype) * jnp.asarray(cfg.nominal_scan_period, dtype)
    state = state._replace(time=now)
    init_pose = odom_guess if odom_guess is not None else state.pose
    first = state.graph.n == 0

    # ---- scan-to-map odometry (skipped on the very first frame) ----
    res = s2m.scan_to_map(
        cfg.scan2map, state.corner_map, state.surf_map,
        corner_pts, corner_mask, surf_pts, surf_mask, init_pose,
    )
    pose = jax.tree.map(lambda a, b: jnp.where(first, a, b), init_pose, res.pose)

    # ---- keyframe gating ----
    is_kf = bk.should_add_keyframe(cfg.backend, state.graph, pose.R, pose.t)

    def add_kf(state):
        """Store the keyframe: node + odometry/IMU/GPS factors + feature/SC
        stores, then the sliding-window solve (iSAM2 update role) and the
        local-map roll-in at the window-refined pose."""
        graph = bk.add_keyframe(
            cfg.backend, state.graph, pose.R, pose.t,
            vel_new=vel_guess, pim=pim,
        )
        k = graph.n - 1

        # ---- GPS factor with the reference's gating ----
        needs_opt_gps = jnp.zeros((), bool)
        if gps_pos is not None:
            cov = gps_cov if gps_cov is not None else jnp.full((3,), 1e-2, dtype)
            ok = (gps_valid if gps_valid is not None else jnp.ones((), bool)) \
                & (jnp.max(cov[:2]) < cfg.gps_cov_thresh) \
                & (jnp.linalg.norm(gps_pos - state.last_gps) > cfg.gps_dist)
            info = 1.0 / jnp.maximum(cov, 1e-4)
            if not cfg.use_gps_elevation:
                info = info.at[2].set(1e-6)  # z unconstrained (useGpsElevation=false)
            graph = jax.lax.cond(ok, lambda g: bk.add_gps(g, k, gps_pos, info), lambda g: g, graph)
            state = state._replace(last_gps=jnp.where(ok, gps_pos, state.last_gps))
            needs_opt_gps = ok

        desc, key = sc.make_descriptor(cfg.scancontext, surf_pts, surf_mask)
        state = state._replace(
            graph=graph,
            kf_corner=state.kf_corner.at[k].set(corner_pts),
            kf_corner_mask=state.kf_corner_mask.at[k].set(corner_mask),
            kf_surf=state.kf_surf.at[k].set(surf_pts),
            kf_surf_mask=state.kf_surf_mask.at[k].set(surf_mask),
            sc_descs=state.sc_descs.at[k].set(desc),
            sc_keys=state.sc_keys.at[k].set(key),
            kf_time=state.kf_time.at[k].set(state.time),
        )

        if cfg.window_update:
            graph2 = bk.optimize_window(cfg.backend, state.graph, window=cfg.window)
            state = state._replace(graph=graph2)
        # roll the keyframe's features into the local maps at the
        # (window-refined) pose
        kf_i = jnp.maximum(state.graph.n - 1, 0)
        pk = se3.Pose(state.graph.R[kf_i], state.graph.t[kf_i])
        cmap = ops.insert(cfg.scan2map.corner_grid, state.corner_map, pk.apply(corner_pts), corner_mask)
        smap = ops.insert(cfg.scan2map.surf_grid, state.surf_map, pk.apply(surf_pts), surf_mask)
        return state._replace(corner_map=cmap, surf_map=smap), needs_opt_gps

    state, needs_opt_gps = jax.lax.cond(
        is_kf, add_kf, lambda s: (s, jnp.zeros((), bool)), state
    )

    # on a keyframe, the pose is the graph node (window-solve refinement
    # included); between keyframes it is the scan-to-map estimate
    kf_i = jnp.maximum(state.graph.n - 1, 0)
    pose = jax.tree.map(
        lambda a, b: jnp.where(is_kf, b, a), pose, se3.Pose(state.graph.R[kf_i], state.graph.t[kf_i])
    )
    state = state._replace(pose=pose)

    # ---- dual-channel loop closure on the LATEST keyframe: at keyframe
    # creation (the inline path) and at fixed frame cadence even when no
    # keyframe was created (the reference's 1 Hz loop thread,
    # mapOptmization.cpp:592-605). Both detectors run independently and can
    # each queue a factor (RS + SC channels). ----
    cadence = jnp.zeros((), bool)
    if cfg.loop_detect_every > 0:
        cadence = (
            (~is_kf)
            & (state.frame_idx % cfg.loop_detect_every == 0)
            & (state.loop_closed_kf != kf_i)
        )
    do_detect = (is_kf | cadence) & (state.graph.n >= 2)
    if cfg.loop_cooldown > 0:
        do_detect &= (state.frame_idx - state.last_loop_frame) >= cfg.loop_cooldown

    def detect_and_close(state):
        g = state.graph
        k = jnp.maximum(g.n - 1, 0)
        pose_k = se3.Pose(g.R[k], g.t[k])
        s_pts, s_mask = state.kf_surf[k], state.kf_surf_mask[k]
        desc, key = state.sc_descs[k], state.sc_keys[k]
        cand_sc = sc.detect(cfg.scancontext, desc, key, state.sc_descs, state.sc_keys, g.n)
        if cfg.rs_loop:
            rs_j, rs_found = _rs_detect(cfg, g, state.kf_time, state.time, pose_k.t)
        else:
            rs_j, rs_found = jnp.asarray(-1, jnp.int32), jnp.zeros((), bool)

        def make_verify(j_cand, yaw, method, robust):
            def verify(state):
                j = jnp.maximum(j_cand, 0)
                pose_rel, fitness, conv = _verify_loop(
                    cfg, state, j, pose_k, s_pts, s_mask, yaw, method
                )
                good = (fitness < cfg.loop_fitness_thresh) & conv

                def add(state):
                    info = jnp.full((6,), 1.0 / jnp.maximum(fitness, 1e-3), dtype)
                    graph2 = bk.add_loop(
                        cfg.backend, state.graph, j, k, pose_rel.R, pose_rel.t, info, robust=robust
                    )
                    return state._replace(
                        graph=graph2,
                        n_loops_found=state.n_loops_found + 1,
                        loop_closed_kf=k,
                        last_loop_frame=state.frame_idx,
                    )

                return jax.lax.cond(good, add, lambda s: s, state), good
            return verify

        no_loop = lambda s: (s, jnp.zeros((), bool))
        # SC channel: ICP verification, Cauchy-robust factor (:822-835)
        state, sc_added = jax.lax.cond(
            cand_sc.found, make_verify(cand_sc.index, cand_sc.yaw, "icp", True), no_loop, state
        )
        # RS channel: NDT verification, plain diagonal factor (:683-731);
        # skipped when SC already closed against the same keyframe
        rs_go = rs_found & ~(cand_sc.found & (rs_j == cand_sc.index))
        state, rs_added = jax.lax.cond(
            rs_go, make_verify(rs_j, jnp.zeros((), dtype), cfg.rs_verify, False), no_loop, state
        )
        looped = sc_added | rs_added
        cand_j = jnp.where(sc_added, cand_sc.index, rs_j)
        return state, looped, jnp.where(looped, cand_j, -1)

    state, looped, loop_idx = jax.lax.cond(
        do_detect, detect_and_close,
        lambda s: (s, jnp.zeros((), bool), jnp.asarray(-1, jnp.int32)), state,
    )

    # ---- full-graph solve (the correctPoses moment): deferred by default —
    # loop events queue `loop_solve_sweeps` GN sweeps, ONE sweep runs per
    # frame (keyframe or not), each applying the latest-node pose delta to
    # the odometry pose and rebuilding the local maps so matching always
    # sees a self-consistent (graph, map, pose) triple ----
    trigger = looped
    if not cfg.window_update:
        trigger = trigger | needs_opt_gps  # no window solve to absorb GPS

    def solve_and_correct(gn_iters, pcg_iters=None):
        def f(state):
            g = state.graph
            k = jnp.maximum(g.n - 1, 0)
            R_old, t_old = g.R[k], g.t[k]
            g2 = bk.optimize(cfg.backend, g, gn_iterations=gn_iters, pcg_iterations=pcg_iters)
            # left (world-frame) delta of the latest node, applied to the
            # odometry pose: pose' = (T_k_new T_k_old^-1) pose
            dR = g2.R[k] @ R_old.T
            dt = g2.t[k] - dR @ t_old
            pose2 = se3.Pose(dR @ state.pose.R, dR @ state.pose.t + dt)
            # rebuild the local maps only when the graph has moved since the
            # LAST rebuild (max node displacement over ALL nodes — on a
            # revisit the local map is built from OLD nodes, so the
            # latest-node delta alone would miss their correction; the
            # accumulator bounds total staleness, not just this sweep's).
            # Late drain sweeps converge to sub-cm deltas and skip the
            # dominant rebuild cost.
            delta = jnp.max(jnp.linalg.norm(g2.t - g.t, axis=-1)) + state.map_stale_m
            need_rebuild = delta > cfg.map_rebuild_min_delta

            def rebuild(st):
                cmap, smap = _rebuild_maps(cfg, st, g2, g2.t[k])
                return st._replace(corner_map=cmap, surf_map=smap,
                                   map_stale_m=jnp.zeros((), g2.t.dtype))

            state = jax.lax.cond(
                need_rebuild, rebuild,
                lambda st: st._replace(map_stale_m=delta), state)
            return state._replace(
                graph=g2, pose=pose2,
                opt_sweeps=jnp.maximum(state.opt_sweeps - 1, 0),
            )
        return f

    if cfg.deferred_loop_solve:
        n_sweeps, pcg_iters = deferred_sweep_plan(cfg)
        state = state._replace(
            opt_sweeps=jnp.where(trigger, jnp.asarray(n_sweeps, jnp.int32), state.opt_sweeps)
        )
        state = jax.lax.cond(state.opt_sweeps > 0, solve_and_correct(1, pcg_iters),
                             lambda s: s, state)
    else:
        state = jax.lax.cond(trigger, solve_and_correct(None), lambda s: s, state)

    state = state._replace(frame_idx=state.frame_idx + 1)
    out = SLAMOutput(
        pose=state.pose,
        is_keyframe=is_kf,
        loop_detected=loop_idx >= 0,
        loop_index=loop_idx,
        degenerate=res.degenerate,
        num_surf_matches=res.num_surf,
        opt_pending=state.opt_sweeps,
    )
    return state, out
