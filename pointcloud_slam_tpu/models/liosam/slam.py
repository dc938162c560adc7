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
map rebuild gathers the last W keyframes, transforms them by their corrected
poses, and re-inserts in ONE scatter — no per-keyframe host loop. The loop
"thread" runs inline at keyframe rate (the reference thread runs at 1 Hz).
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


class SLAMOutput(NamedTuple):
    pose: se3.Pose
    is_keyframe: jnp.ndarray
    loop_detected: jnp.ndarray
    loop_index: jnp.ndarray
    degenerate: jnp.ndarray
    num_surf_matches: jnp.ndarray


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
    )


def _rebuild_maps(cfg: SLAMConfig, state: SLAMState, graph: bk.PoseGraph, pose_t):
    """Local maps from the surrounding-keyframe set at their (corrected) poses.

    Spatial extraction parity (extractNearby, mapOptmization.cpp:1153-1181):
    the `local_window` keyposes nearest `pose_t` within `surrounding_radius`,
    with the `local_recent` newest keyframes force-included (the 10 s window
    role) — so on a revisit the OLD spatially-near keyframes re-enter the
    local map with their corrected geometry. One transform + one insert per
    feature family."""
    W = cfg.local_window
    KF = cfg.backend.max_keyframes
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
    # the time gate applies only when the caller supplies timestamps
    # (state.time >= 0); otherwise the index gap alone stands in
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
    time_sec: Optional[jnp.ndarray] = None,      # () scan time [s] (RS loop time gate)
):
    dtype = surf_pts.dtype
    if time_sec is not None:
        state = state._replace(time=jnp.asarray(time_sec, dtype))
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

        # ---- dual-channel loop closure: BOTH detectors run independently
        # and can each queue a factor this keyframe (the reference's RS + SC
        # channels are independent, mapOptmization.cpp:592-605) ----
        cand_sc = sc.detect(cfg.scancontext, desc, key, state.sc_descs, state.sc_keys, graph.n)
        if cfg.rs_loop:
            rs_j, rs_found = _rs_detect(cfg, graph, state.kf_time, state.time, pose.t)
        else:
            rs_j, rs_found = jnp.asarray(-1, jnp.int32), jnp.zeros((), bool)

        def make_verify(j_cand, yaw, method, robust):
            def verify(state):
                j = jnp.maximum(j_cand, 0)
                pose_rel, fitness, conv = _verify_loop(
                    cfg, state, j, pose, surf_pts, surf_mask, yaw, method
                )
                good = (fitness < cfg.loop_fitness_thresh) & conv

                def add(state):
                    info = jnp.full((6,), 1.0 / jnp.maximum(fitness, 1e-3), dtype)
                    graph2 = bk.add_loop(
                        cfg.backend, state.graph, j, k, pose_rel.R, pose_rel.t, info, robust=robust
                    )
                    return state._replace(graph=graph2, n_loops_found=state.n_loops_found + 1)

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

        # ---- optimization: full batch solve + map rebuild on loop events;
        # cheap sliding-window solve (the iSAM2 update role) otherwise ----
        def full_opt(state):
            graph2 = bk.optimize(cfg.backend, state.graph)
            cmap, smap = _rebuild_maps(cfg, state, graph2, graph2.t[jnp.maximum(graph2.n - 1, 0)])
            return state._replace(graph=graph2, corner_map=cmap, surf_map=smap)

        def incremental(state):
            if cfg.window_update:
                graph2 = bk.optimize_window(cfg.backend, state.graph, window=cfg.window)
                state = state._replace(graph=graph2)
            # roll the current keyframe's features into the local maps at the
            # (window-refined) pose
            kf_i = jnp.maximum(state.graph.n - 1, 0)
            pk = se3.Pose(state.graph.R[kf_i], state.graph.t[kf_i])
            pc = pk.apply(corner_pts)
            ps = pk.apply(surf_pts)
            cmap = ops.insert(cfg.scan2map.corner_grid, state.corner_map, pc, corner_mask)
            smap = ops.insert(cfg.scan2map.surf_grid, state.surf_map, ps, surf_mask)
            return state._replace(corner_map=cmap, surf_map=smap)

        if cfg.window_update:
            do_full = looped
        else:
            do_full = looped | needs_opt_gps  # no window solve to absorb GPS
        state = jax.lax.cond(do_full, full_opt, incremental, state)
        return state, looped, jnp.where(looped, cand_j, -1)

    def no_kf(state):
        return state, jnp.zeros((), bool), jnp.asarray(-1, jnp.int32)

    state, corrected, loop_idx = jax.lax.cond(is_kf, add_kf, no_kf, state)
    # on a keyframe, the pose is the graph node (window/full solve refinements
    # included); between keyframes it is the scan-to-map estimate
    kf_i = jnp.maximum(state.graph.n - 1, 0)
    pose_corr = jax.tree.map(
        lambda a, b: jnp.where(is_kf, b, a), pose, se3.Pose(state.graph.R[kf_i], state.graph.t[kf_i])
    )
    state = state._replace(pose=pose_corr)
    out = SLAMOutput(
        pose=pose_corr,
        is_keyframe=is_kf,
        loop_detected=loop_idx >= 0,
        loop_index=loop_idx,
        degenerate=res.degenerate,
        num_surf_matches=res.num_surf,
    )
    return state, out
