"""Pose-graph back-end: (pose, vel, bias) keyframe nodes + factors + GN/PCG.

Behavioral parity target (same factors and gating; solver re-designed):
  reference `src/jueying_slam/src/mapOptmization.cpp`
  - keyframe gating by motion thresholds (`saveKeyFramesAndFactor` :1637-1884),
  - `addOdomFactor` (:1658): between factors on consecutive keyframes,
  - `addGPSFactor` (:1678): position priors,
  - `addLoopFactor` (:1757): loop-closure between factors, with the SC loops
    carrying a Cauchy robust kernel (mapOptmization.cpp:822-835) — realized
    here as per-iteration IRLS reweighting w = c^2 / (c^2 + chi^2),
  and `src/jueying_slam/src/imuPreintegration.cpp`
  - the IMU factor graph over (pose, velocity, bias) nodes (:243-438):
    gtsam ImuFactor -> the preintegrated-delta residual of
    `models/lio/preintegration.py`, plus the bias random-walk BetweenFactor.
  - iSAM2 incremental smoothing -> replaced by batched Gauss-Newton over the
    whole graph with a Jacobi(block)-preconditioned conjugate-gradient solve
    of the normal equations. Matrix-free: H v is accumulated factor-by-factor
    with gathers/scatter-adds — no sparse matrix is ever materialized
    (BASELINE.json's "sparse LM with PCG on the Schur complement" role).
  - `correctPoses` (:1886-1917): the solved poses rewrite the keyframe store.

Node tangent layout (15 dims): [rot 0:3, trans 3:6, vel 6:9, bg 9:12, ba 12:15]
with right perturbations R' = R Exp(dr), t' = t + R dt. Between-factor
linearization uses Jr^-1 ~ I and the exact SE(3) adjoint; the IMU factor is
linearized per factor by forward-mode autodiff of the local residual (vmapped
jacfwd over factors — small closed-form algebra, no sparse structure). Graphs
with no IMU/bias factors reduce exactly to the round-1 pose-only behavior
(vel/bias nodes are pinned by unit priors).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ...geom import se3, so3
from ..lio import preintegration as pre

D = 15          # node tangent dims
RMAX = 9        # max residual rows per factor (IMU factor)


@dataclasses.dataclass(frozen=True)
class BackendConfig:
    max_keyframes: int = 2048
    max_loops: int = 256
    gn_iterations: int = 6
    pcg_iterations: int = 60
    keyframe_angle_thresh: float = 0.2     # rad (surroundingkeyframeAddingAngleThreshold)
    keyframe_dist_thresh: float = 1.0      # m  (surroundingkeyframeAddingDistThreshold)
    prior_info: float = 1e8                # gauge prior on node 0
    loop_cauchy_c: float = 1.0             # robust kernel scale (whitened chi)
    # default information of the bias random-walk between factor
    # (1/sigma^2 of gtsam's biasAccOmegaInt-style walk over one keyframe gap)
    bias_walk_info: float = 1e4
    # trust region for one GN sweep of optimize(): the largest per-node pose
    # update (rad | m) a single sweep may apply; the whole step is scaled,
    # never truncated per-node (see optimize). A LOOSE safety net by design:
    # legitimate global loop corrections can move endpoints tens of meters
    # in one sweep (the chain preconditioner exists to propagate them;
    # test_long_chain_loop_correction_converges collapses 18 m in one solve)
    # while the pathology this guards against moved a node 1.6e5 m
    # (conflicting loop/odometry factors, see RESULTS round 4).
    max_step: float = 30.0
    # the per-keyframe WINDOW solve gets its own, tighter bound: it only
    # refines the recent odometry tail (legit corrections are sub-meter) and
    # its output feeds the local-map roll-in scan-to-map matches against
    # next frame — a single bad factor touching the window must not displace
    # recent nodes tens of meters before the deferred full solve weighs in
    window_max_step: float = 5.0


class PoseGraph(NamedTuple):
    # nodes
    R: jnp.ndarray          # (KF, 3, 3)
    t: jnp.ndarray          # (KF, 3)
    vel: jnp.ndarray        # (KF, 3) world-frame velocity
    bg: jnp.ndarray         # (KF, 3) gyro bias
    ba: jnp.ndarray         # (KF, 3) accel bias
    n: jnp.ndarray          # () int32 active keyframes
    # odometry between factor i-1 -> i (slot i; slot 0 unused)
    odom_R: jnp.ndarray     # (KF, 3, 3)
    odom_t: jnp.ndarray     # (KF, 3)
    odom_info: jnp.ndarray  # (KF, 6) diagonal information
    # IMU preintegration factor i-1 -> i (slot i), gtsam ImuFactor role
    imu_pim: pre.PreintegratedImu  # batched (KF, ...) preintegrated deltas
    imu_info: jnp.ndarray   # (KF, 9) diagonal information [er, ev, ep]
    imu_mask: jnp.ndarray   # (KF,) bool — slot has an IMU factor
    bias_info: jnp.ndarray  # (KF, 6) bias random-walk information
    # loop factors i -> j
    loop_i: jnp.ndarray     # (L,)
    loop_j: jnp.ndarray     # (L,)
    loop_R: jnp.ndarray     # (L, 3, 3)
    loop_t: jnp.ndarray     # (L, 3)
    loop_info: jnp.ndarray  # (L, 6)
    loop_robust: jnp.ndarray  # (L,) bool — apply the Cauchy kernel
    n_loops: jnp.ndarray    # ()
    # position priors (GPS)
    prior_mask: jnp.ndarray  # (KF,)
    prior_pos: jnp.ndarray   # (KF, 3)
    prior_info: jnp.ndarray  # (KF, 3)
    grav: jnp.ndarray        # (3,) gravity vector for IMU factors


def _empty_pim(KF: int, dtype) -> pre.PreintegratedImu:
    eye = jnp.broadcast_to(jnp.eye(3, dtype=dtype), (KF, 3, 3))
    z3 = jnp.zeros((KF, 3), dtype)
    z33 = jnp.zeros((KF, 3, 3), dtype)
    return pre.PreintegratedImu(
        dR=eye, dv=z3, dp=z3, dt=jnp.zeros((KF,), dtype),
        dR_dbg=z33, dv_dbg=z33, dv_dba=z33, dp_dbg=z33, dp_dba=z33,
        bg0=z3, ba0=z3,
    )


def create(cfg: BackendConfig, dtype=jnp.float32, gravity: float = 9.81) -> PoseGraph:
    KF, L = cfg.max_keyframes, cfg.max_loops
    eye = jnp.broadcast_to(jnp.eye(3, dtype=dtype), (KF, 3, 3))
    return PoseGraph(
        R=eye, t=jnp.zeros((KF, 3), dtype),
        vel=jnp.zeros((KF, 3), dtype), bg=jnp.zeros((KF, 3), dtype), ba=jnp.zeros((KF, 3), dtype),
        n=jnp.zeros((), jnp.int32),
        odom_R=eye, odom_t=jnp.zeros((KF, 3), dtype), odom_info=jnp.zeros((KF, 6), dtype),
        imu_pim=_empty_pim(KF, dtype),
        imu_info=jnp.zeros((KF, 9), dtype),
        imu_mask=jnp.zeros((KF,), bool),
        bias_info=jnp.zeros((KF, 6), dtype),
        loop_i=jnp.zeros((L,), jnp.int32), loop_j=jnp.zeros((L,), jnp.int32),
        loop_R=jnp.broadcast_to(jnp.eye(3, dtype=dtype), (L, 3, 3)), loop_t=jnp.zeros((L, 3), dtype),
        loop_info=jnp.zeros((L, 6), dtype), loop_robust=jnp.zeros((L,), bool),
        n_loops=jnp.zeros((), jnp.int32),
        prior_mask=jnp.zeros((KF,), bool), prior_pos=jnp.zeros((KF, 3), dtype),
        prior_info=jnp.zeros((KF, 3), dtype),
        grav=jnp.asarray([0.0, 0.0, -gravity], dtype),
    )


def grow(cfg: BackendConfig, g: PoseGraph,
         max_keyframes: Optional[int] = None,
         max_loops: Optional[int] = None):
    """HOST-side capacity growth: re-pad every graph array to a larger
    `max_keyframes` / `max_loops` (defaults: double each). Returns
    `(new_cfg, new_graph)`; the new config is a different static jit key, so
    each growth costs one recompile — geometric doubling makes that O(log)
    compiles over an unbounded trajectory. This is the TPU-native counterpart
    of the reference's unbounded keyframe story (the gtsam graph just grows
    and keyframe clouds stream to disk, mapOptmization.cpp:249-263,1868-1880):
    trajectory length is bounded by device memory, not a compile-time
    constant. Existing nodes/factors are bit-identical after growth; padded
    slots carry `create`'s inert values (identity rotations, zero
    information)."""
    KF_new = cfg.max_keyframes * 2 if max_keyframes is None else max_keyframes
    L_new = cfg.max_loops * 2 if max_loops is None else max_loops
    if KF_new < cfg.max_keyframes or L_new < cfg.max_loops:
        raise ValueError("grow() cannot shrink the graph")
    dtype = g.t.dtype
    new_cfg = dataclasses.replace(cfg, max_keyframes=KF_new, max_loops=L_new)
    blank = create(new_cfg, dtype, gravity=float(-g.grav[2]))

    def pad(old, new):
        if old.shape == new.shape:   # scalars (n, n_loops) and grav
            return old
        return new.at[tuple(slice(0, s) for s in old.shape)].set(old)

    return new_cfg, jax.tree.map(pad, g, blank)


def should_add_keyframe(cfg: BackendConfig, g: PoseGraph, R_new, t_new):
    """Motion gating vs the last keyframe (saveKeyFramesAndFactor :1637).

    Also gates on store capacity: at `n == max_keyframes` no further keyframe
    is accepted (add_keyframe would be a no-op anyway, and slam_step must not
    overwrite the last slot's feature/SC stores). The reference's keyframe
    store is unbounded (per-keyframe disk writes + a growing gtsam graph,
    mapOptmization.cpp:249-263,1868-1880); the equivalent here is HOST-side
    geometric growth — see `grow` / `slam.grow_state` — which apps invoke
    before this gate ever trips."""
    last = jnp.maximum(g.n - 1, 0)
    dR = so3.boxminus(R_new, g.R[last])
    dt = t_new - g.t[last]
    move = (jnp.max(jnp.abs(dR)) > cfg.keyframe_angle_thresh) | (jnp.linalg.norm(dt) > cfg.keyframe_dist_thresh)
    return (move | (g.n == 0)) & (g.n < cfg.max_keyframes)


def add_keyframe(
    cfg: BackendConfig,
    g: PoseGraph,
    R_new,
    t_new,
    odom_info_diag=None,
    vel_new=None,
    pim: Optional[pre.PreintegratedImu] = None,
    imu_info_diag=None,
    bias_info_diag=None,
) -> PoseGraph:
    """Append a node + odometry between factor from the previous node.

    When `pim` is given (the IMU preintegration over the gap since the last
    keyframe), an IMU factor + bias random-walk factor are attached to this
    slot — the imuPreintegration node's graph contribution
    (imuPreintegration.cpp:243-438).

    Saturation is a strict NO-OP: at `n == max_keyframes` every write targets
    the out-of-range slot KF and is dropped, and `n` does not change — the
    graph stays exactly consistent (previously the new node clamp-overwrote
    slot KF-1 while its odometry factor had been computed against the value
    being overwritten, silently corrupting the graph). Capacity itself is a
    host concern: call `grow` to extend the store (unbounded-trajectory role
    of the reference's disk store, mapOptmization.cpp:249-263,1868-1880)."""
    dtype = g.t.dtype
    KF = cfg.max_keyframes
    if odom_info_diag is None:
        # reference odometryNoise variances: rot 1e-6, trans 1e-4
        # (mapOptmization.cpp:1666) -> information 1e6 / 1e4
        odom_info_diag = jnp.concatenate([jnp.full((3,), 1e6, dtype), jnp.full((3,), 1e4, dtype)])
    full = g.n >= KF
    i = jnp.where(full, KF, g.n)  # out-of-range when full -> scatters drop
    last = jnp.maximum(g.n - 1, 0)
    relR = jnp.swapaxes(g.R[last], -1, -2) @ R_new
    relt = jnp.einsum("ij,j->i", jnp.swapaxes(g.R[last], -1, -2), t_new - g.t[last])
    first = g.n == 0
    if vel_new is None:
        vel_new = jnp.zeros(3, dtype)
    g = g._replace(
        R=g.R.at[i].set(R_new, mode="drop"),
        t=g.t.at[i].set(t_new, mode="drop"),
        vel=g.vel.at[i].set(vel_new, mode="drop"),
        bg=g.bg.at[i].set(g.bg[last], mode="drop"),
        ba=g.ba.at[i].set(g.ba[last], mode="drop"),
        odom_R=g.odom_R.at[i].set(jnp.where(first, jnp.eye(3, dtype=dtype), relR), mode="drop"),
        odom_t=g.odom_t.at[i].set(jnp.where(first, jnp.zeros(3, dtype), relt), mode="drop"),
        odom_info=g.odom_info.at[i].set(jnp.where(first, jnp.zeros(6, dtype), odom_info_diag), mode="drop"),
        n=jnp.minimum(g.n + 1, KF),
    )
    if pim is not None:
        if imu_info_diag is None:
            imu_info_diag = jnp.concatenate([
                jnp.full((3,), 1e6, dtype), jnp.full((3,), 1e4, dtype), jnp.full((3,), 1e4, dtype)
            ])
        if bias_info_diag is None:
            bias_info_diag = jnp.full((6,), cfg.bias_walk_info, dtype)
        has = ~first
        g = g._replace(
            imu_pim=jax.tree.map(lambda a, b: a.at[i].set(b, mode="drop"), g.imu_pim, pim),
            imu_info=g.imu_info.at[i].set(jnp.where(has, imu_info_diag, 0.0), mode="drop"),
            imu_mask=g.imu_mask.at[i].set(has, mode="drop"),
            bias_info=g.bias_info.at[i].set(jnp.where(has, bias_info_diag, 0.0), mode="drop"),
        )
    return g


def add_loop(cfg: BackendConfig, g: PoseGraph, i, j, relR, relt, info_diag, robust=True) -> PoseGraph:
    """Append a loop-closure between factor i -> j (addLoopFactor :1757).

    Saturation is a strict no-op (previously the last slot was silently
    re-overwritten forever); extend capacity host-side with `grow`."""
    L = cfg.max_loops
    full = g.n_loops >= L
    k = jnp.where(full, L, g.n_loops)  # out-of-range when full -> drop
    return g._replace(
        loop_i=g.loop_i.at[k].set(i, mode="drop"),
        loop_j=g.loop_j.at[k].set(j, mode="drop"),
        loop_R=g.loop_R.at[k].set(relR, mode="drop"),
        loop_t=g.loop_t.at[k].set(relt, mode="drop"),
        loop_info=g.loop_info.at[k].set(info_diag, mode="drop"),
        loop_robust=g.loop_robust.at[k].set(jnp.asarray(robust, bool), mode="drop"),
        n_loops=jnp.minimum(g.n_loops + 1, L),
    )


def add_gps(g: PoseGraph, i, pos, info_diag) -> PoseGraph:
    """Position prior on node i (addGPSFactor :1678)."""
    return g._replace(
        prior_mask=g.prior_mask.at[i].set(True),
        prior_pos=g.prior_pos.at[i].set(pos),
        prior_info=g.prior_info.at[i].set(info_diag),
    )


def _adjoint(R, t):
    """SE(3) adjoint for [rot, trans] tangent ordering: (..., 6, 6)."""
    hat_t = so3.hat(t)
    top = jnp.concatenate([R, jnp.zeros_like(R)], axis=-1)
    bot = jnp.concatenate([hat_t @ R, R], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def _between_residual(Ri, ti, Rj, tj, Rm, tm):
    """e = Log(M^-1 (T_i^-1 T_j)) with T = (R, t), M the measurement."""
    R_ij = jnp.swapaxes(Ri, -1, -2) @ Rj
    t_ij = jnp.einsum("...ij,...j->...i", jnp.swapaxes(Ri, -1, -2), tj - ti)
    Re = jnp.swapaxes(Rm, -1, -2) @ R_ij
    te = jnp.einsum("...ij,...j->...i", jnp.swapaxes(Rm, -1, -2), t_ij - tm)
    return jnp.concatenate([so3.log(Re), te], axis=-1)


def _between_jacobians(Ri, ti, Rj, tj):
    """Right-perturbation Jacobians with Jr^-1 ~ I:
    J_j = I ; J_i = -Ad(T_j^-1 T_i)."""
    R_ji = jnp.swapaxes(Rj, -1, -2) @ Ri
    t_ji = jnp.einsum("...ij,...j->...i", jnp.swapaxes(Rj, -1, -2), ti - tj)
    Ji = -_adjoint(R_ji, t_ji)
    return Ji


def _pad_between(Ji6, F, dtype):
    """Embed a (F, 6, 6) pose-block Jacobian into (F, RMAX, D) factor rows."""
    Ji = jnp.zeros((F, RMAX, D), dtype)
    Ji = Ji.at[:, 0:6, 0:6].set(Ji6)
    Jj = jnp.zeros((F, RMAX, D), dtype)
    Jj = Jj.at[:, 0:6, 0:6].set(jnp.broadcast_to(jnp.eye(6, dtype=dtype), (F, 6, 6)))
    return Ji, Jj


def _imu_local_residual(dxi, dxj, Ri, ti, vi, bgi, bai, Rj, tj, vj, pim, grav):
    """IMU factor residual under right perturbations of nodes i and j."""
    Ri_ = Ri @ so3.exp(dxi[0:3])
    ti_ = ti + Ri @ dxi[3:6]
    vi_ = vi + dxi[6:9]
    bgi_ = bgi + dxi[9:12]
    bai_ = bai + dxi[12:15]
    Rj_ = Rj @ so3.exp(dxj[0:3])
    tj_ = tj + Rj @ dxj[3:6]
    vj_ = vj + dxj[6:9]
    return pre.residual(pim, Ri_, ti_, vi_, Rj_, tj_, vj_, bgi_, bai_, grav)


def _graph_terms(cfg: BackendConfig, g: PoseGraph, kf_slots=None, loop_slots=None):
    """Assemble the padded per-factor arrays over ALL factor families.

    Returns (fi, fj, Ji (F, RMAX, D), Jj, e (F, RMAX), info (F, RMAX)).
    Inactive rows carry zero information.

    `kf_slots` / `loop_slots` restrict linearization to a SUBSET of the
    per-keyframe factor slots (odometry/IMU/bias share slot k between nodes
    k-1, k) and loop slots — the factor-sharded backend passes each device
    its own slot range so the expensive vmapped-jacfwd IMU linearization is
    computed once per shard, never replicated. Slot values >= the table size
    are inert (zero information; their scatters are dropped). The returned
    `B` holds only the slots' sub-diagonal contributions — shards must psum
    it before `chain_factor`.
    """
    KF = cfg.max_keyframes
    L = g.loop_i.shape[0]
    dtype = g.t.dtype
    idx = jnp.arange(KF) if kf_slots is None else kf_slots
    lidx = jnp.arange(L) if loop_slots is None else loop_slots
    nk = idx.shape[0]

    # ---- odometry between factors (slots 1..n-1; i = k-1, j = k) ----
    o_act = (idx >= 1) & (idx < g.n)
    oi = jnp.maximum(idx - 1, 0)
    oj = idx  # gathers clamp out-of-range rows; o_act zeroes their info
    Ji6_o = _between_jacobians(g.R[oi], g.t[oi], g.R[oj], g.t[oj])
    e6_o = _between_residual(g.R[oi], g.t[oi], g.R[oj], g.t[oj], g.odom_R[idx], g.odom_t[idx])
    Ji_o, Jj_o = _pad_between(Ji6_o, nk, dtype)
    e_o = jnp.zeros((nk, RMAX), dtype).at[:, 0:6].set(e6_o)
    info_o = jnp.zeros((nk, RMAX), dtype).at[:, 0:6].set(g.odom_info[idx] * o_act[:, None])

    # ---- loop between factors, Cauchy-robust IRLS weight ----
    l_act = lidx < g.n_loops
    li, lj = g.loop_i[lidx], g.loop_j[lidx]
    loop_R, loop_t, loop_info = g.loop_R[lidx], g.loop_t[lidx], g.loop_info[lidx]
    nl = lidx.shape[0]
    Ji6_l = _between_jacobians(g.R[li], g.t[li], g.R[lj], g.t[lj])
    e6_l = _between_residual(g.R[li], g.t[li], g.R[lj], g.t[lj], loop_R, loop_t)
    chi2 = jnp.sum(e6_l * e6_l * loop_info, axis=-1)
    c2 = cfg.loop_cauchy_c ** 2
    w_rob = jnp.where(g.loop_robust[lidx], c2 / (c2 + chi2), 1.0)
    Ji_l, Jj_l = _pad_between(Ji6_l, nl, dtype)
    e_l = jnp.zeros((nl, RMAX), dtype).at[:, 0:6].set(e6_l)
    info_l = jnp.zeros((nl, RMAX), dtype).at[:, 0:6].set(loop_info * (l_act * w_rob)[:, None])

    # ---- IMU preintegration factors (slot k between k-1, k) ----
    i_act = o_act & g.imu_mask[idx]
    z15 = jnp.zeros((nk, D), dtype)
    pim = jax.tree.map(lambda a: a[idx], g.imu_pim)
    jac = jax.vmap(
        jax.jacfwd(_imu_local_residual, argnums=(0, 1)),
        in_axes=(0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, None),
    )
    Ji_i9, Jj_i9 = jac(
        z15, z15,
        g.R[oi], g.t[oi], g.vel[oi], g.bg[oi], g.ba[oi],
        g.R[oj], g.t[oj], g.vel[oj], pim, g.grav,
    )
    e9_i = jax.vmap(pre.residual, in_axes=(0,) * 9 + (None,))(
        pim, g.R[oi], g.t[oi], g.vel[oi], g.R[oj], g.t[oj], g.vel[oj],
        g.bg[oi], g.ba[oi], g.grav,
    )
    info_i = g.imu_info[idx] * i_act[:, None]

    # ---- bias random-walk between factors ----
    e6_b = jnp.concatenate([g.bg[oj] - g.bg[oi], g.ba[oj] - g.ba[oi]], axis=-1)
    Ji_b = jnp.zeros((nk, RMAX, D), dtype).at[:, 0:6, 9:15].set(
        jnp.broadcast_to(-jnp.eye(6, dtype=dtype), (nk, 6, 6))
    )
    Jj_b = jnp.zeros((nk, RMAX, D), dtype).at[:, 0:6, 9:15].set(
        jnp.broadcast_to(jnp.eye(6, dtype=dtype), (nk, 6, 6))
    )
    e_b = jnp.zeros((nk, RMAX), dtype).at[:, 0:6].set(e6_b)
    info_b = jnp.zeros((nk, RMAX), dtype).at[:, 0:6].set(g.bias_info[idx] * i_act[:, None])

    fi = jnp.concatenate([oi, li, oi, oi])
    fj = jnp.concatenate([oj, lj, oj, oj])
    Ji = jnp.concatenate([Ji_o, Ji_l, Ji_i9, Ji_b], axis=0)
    Jj = jnp.concatenate([Jj_o, Jj_l, Jj_i9, Jj_b], axis=0)
    e = jnp.concatenate([e_o, e_l, e9_i, e_b], axis=0)
    info = jnp.concatenate([info_o, info_l, info_i, info_b], axis=0)
    # sub-diagonal coupling blocks of the sequential (chain) families for the
    # cyclic-reduction preconditioner; loops stay out (low-rank PCG part)
    B = _offdiag_blocks(KF, dtype, idx, (Ji_o, Ji_i9, Ji_b), (Jj_o, Jj_i9, Jj_b),
                        (info_o, info_i, info_b))
    return fi, fj, Ji, Jj, e, info, B


def _hv(fi, fj, Ji, Jj, info, prior_diag, v):
    """Matrix-free H @ v over all factors. v (KF, D) -> (KF, D)."""
    fv = jnp.einsum("fab,fb->fa", Ji, v[fi]) + jnp.einsum("fab,fb->fa", Jj, v[fj])
    w = info * fv
    out = jnp.zeros_like(v)
    out = out.at[fi].add(jnp.einsum("fba,fb->fa", Ji, w))
    out = out.at[fj].add(jnp.einsum("fba,fb->fa", Jj, w))
    return out + prior_diag * v


def _precond_blocks(KF, dtype, fi, fj, Ji, Jj, info, prior_diag):
    """Block-diagonal of H (KF, D, D), NOT inverted (feeds the chain
    preconditioner's diagonal)."""
    blocks = jnp.zeros((KF, D, D), dtype)
    blocks = blocks.at[fi].add(jnp.einsum("fba,fb,fbc->fac", Ji, info, Ji))
    blocks = blocks.at[fj].add(jnp.einsum("fba,fb,fbc->fac", Jj, info, Jj))
    blocks = blocks + jax.vmap(jnp.diag)(prior_diag)
    blocks = blocks + 1e-6 * jnp.eye(D, dtype=dtype)
    return blocks


def _offdiag_blocks(KF, dtype, slots, Ji_fams, Jj_fams, info_fams):
    """Sub-diagonal blocks L (KF, D, D): L[k] = H[node k, node k-1] — the
    LOWER coupling block chain_factor expects — contributed by the sequential
    factor families (odometry, IMU, bias) whose slot k couples nodes
    (k-1, k): H[k, k-1] = Jj^T W Ji. Loop factors are deliberately
    excluded — they are the low-rank part PCG handles. Family rows are
    scattered by their slot index (out-of-range padding slots drop)."""
    acc = jnp.zeros((slots.shape[0], D, D), dtype)
    for Ji_f, Jj_f, info_f in zip(Ji_fams, Jj_fams, info_fams):
        acc = acc + jnp.einsum("fba,fb,fbc->fac", Jj_f, info_f, Ji_f)
    return jnp.zeros((KF, D, D), dtype).at[slots].add(acc, mode="drop")


def _spd_inv(A, iters=24):
    """Batched SPD inverse via Jacobi-scaled Newton-Schulz — matmul-only.

    `jnp.linalg.inv` on (n, 15, 15) batches lowers to pivoted LU, which the
    TPU executes as scalar-heavy loops (~13 ms for the 5k graph's reduction
    levels, the dominant chain_factor cost — measured in
    tools/probe_backend_sweep.py). Newton-Schulz is two batched 15x15
    einsums per iteration, pure MXU work. The blocks' diagonals span 1e0-1e8
    (gauge/unit priors vs odometry info), which would stall plain NS, so the
    matrix is symmetrically scaled to unit diagonal first (condition of the
    scaled block is set by the off-diagonal structure, not the info spread).
    The result is symmetrized so the cyclic-reduction preconditioner stays
    symmetric for PCG."""
    d = jnp.sqrt(jnp.clip(jnp.diagonal(A, axis1=-2, axis2=-1), 1e-20))
    S = A / (d[..., :, None] * d[..., None, :])
    eye = jnp.eye(A.shape[-1], dtype=A.dtype)
    norm1 = jnp.max(jnp.sum(jnp.abs(S), axis=-1), axis=-1)
    norminf = jnp.max(jnp.sum(jnp.abs(S), axis=-2), axis=-1)
    X = jnp.swapaxes(S, -1, -2) / (norm1 * norminf)[..., None, None]

    def body(X, _):
        SX = jnp.einsum("...ab,...bc->...ac", S, X)
        return jnp.einsum("...ab,...bc->...ac", X, 2.0 * eye - SX), None

    X, _ = jax.lax.scan(body, X, None, length=iters)
    X = 0.5 * (X + jnp.swapaxes(X, -1, -2))
    return X / (d[..., :, None] * d[..., None, :])


def chain_factor(Dblk, L, direct_n=256):
    """Block cyclic reduction factorization of the SPD block-tridiagonal
    system diag(Dblk) + sub-diagonal L (L[k] couples node k-1 -> k, L[0]=0).

    The odometry/IMU backbone of a pose graph IS this system; solving it
    exactly as the PCG preconditioner makes convergence depend on the number
    of loop closures instead of the trajectory length (a 5k-node chain needs
    ~5k block-Jacobi PCG iterations to propagate a loop correction; with the
    chain solve it needs ~tens). Cyclic reduction runs log2 levels of
    BATCHED 15x15 block algebra — no sequential scans — so it maps onto the
    TPU the way the length-parallel solvers in the literature map onto GPUs.

    HYBRID tail (round 5): reduction stops once the system is <= `direct_n`
    nodes and the remainder is solved DENSELY via one Cholesky factorization.
    The deepest reduction levels have tiny batches (80, 40, 20, ... blocks) —
    pure kernel-launch latency on a TPU, two launches per level per
    chain_solve — while the dense tail is a single MXU-friendly cho_solve.
    At 5k nodes this cuts a chain_solve from ~26 sequential small kernels to
    ~11 (measured in tools/probe_backend_sweep.py; drives the deferred-sweep
    drain stall down, VERDICT r4 next #5).

    Returns (levels, tail) consumed by `chain_solve`.
    """
    dtype = Dblk.dtype
    eye = jnp.eye(Dblk.shape[-1], dtype=dtype)
    levels = []
    Dl, Ll = Dblk, L
    n = Dl.shape[0]
    while n > max(direct_n, 1):
        n_odd = n // 2
        n_even = n - n_odd
        De = Dl[0::2]
        Do = Dl[1::2]
        Le = Ll[0::2]                                        # L[2m]: couples 2m-1 -> 2m
        Lo = Ll[1::2]                                        # L[2m+1]: couples 2m -> 2m+1
        Do_inv = _spd_inv(Do + 1e-8 * eye)
        # pad odd-side arrays to n_even for the shifted/boundary terms
        pad = n_even - n_odd
        Do_inv_p = jnp.concatenate([Do_inv, jnp.broadcast_to(eye, (pad, *eye.shape))], 0) if pad else Do_inv
        Lo_p = jnp.concatenate([Lo, jnp.zeros((pad, *eye.shape), dtype)], 0) if pad else Lo
        # A[m] = L[2m] @ Do_inv[m-1]  (A[0] = 0 since L[0] = 0)
        Do_inv_shift = jnp.concatenate([jnp.broadcast_to(eye, (1, *eye.shape)), Do_inv_p[:-1]], 0)
        A = jnp.einsum("mab,mbc->mac", Le, Do_inv_shift)
        # C[m] = L[2m+1]^T @ Do_inv[m]  (zero at the padded tail)
        C = jnp.einsum("mba,mbc->mac", Lo_p, Do_inv_p)
        # reduced diagonal / sub-diagonal over the even nodes
        D_new = De - jnp.einsum("mab,mcb->mac", A, Le) - jnp.einsum("mab,mbc->mac", C, Lo_p)
        Lo_shift = jnp.concatenate([jnp.zeros((1, *eye.shape), dtype), Lo_p[:-1]], 0)
        L_new = -jnp.einsum("mab,mbc->mac", A, Lo_shift)
        # back-substitution needs: x_o[m] = Do_inv[m] (r_o[m] - Lo[m] x_e[m]
        #                                   - Le[m+1]^T x_e[m+1])
        LeT_next = jnp.swapaxes(jnp.concatenate([Le[1:], jnp.zeros((1, *eye.shape), dtype)], 0), -1, -2)[:n_odd]
        levels.append({"A": A, "C": C, "Do_inv": Do_inv, "Lo": Lo, "LeT_next": LeT_next, "n": n})
        Dl, Ll, n = D_new, L_new, n_even
    # dense tail: assemble the remaining block-tridiagonal system and
    # Cholesky-factor it once (it is the SPD Schur complement of the chain).
    # Jacobi-scaled to unit diagonal first: the raw diagonal spans 1e0
    # (unit priors) to 1e8 (gauge), and an f32 Cholesky of that conditioning
    # breaks down into NaNs (observed on the KF=512 product graph); the
    # scaled system's conditioning is set by the coupling structure only.
    B = Dl.shape[-1]
    M = jnp.zeros((n, B, n, B), dtype)
    idx = jnp.arange(n)
    M = M.at[idx, :, idx, :].set(Dl)
    if n > 1:
        M = M.at[idx[1:], :, idx[:-1], :].set(Ll[1:])
        M = M.at[idx[:-1], :, idx[1:], :].set(jnp.swapaxes(Ll[1:], -1, -2))
    M = M.reshape(n * B, n * B)
    d = jnp.sqrt(jnp.clip(jnp.diagonal(M), 1e-20))
    M = M / (d[:, None] * d[None, :]) + 1e-6 * jnp.eye(n * B, dtype=dtype)
    tail = (jax.scipy.linalg.cho_factor(M)[0], d, n)
    return levels, tail


def chain_solve(levels, tail, r):
    """Apply the cyclic-reduction factorization: solve M x = r, r (KF, D)."""
    # down sweep: reduce the RHS to the even sub-systems, stashing the odd r
    stack = []
    for lv in levels:
        r_e = r[0::2]
        r_o = r[1::2]
        pad = r_e.shape[0] - r_o.shape[0]
        r_o_p = jnp.concatenate([r_o, jnp.zeros((pad, r.shape[1]), r.dtype)], 0) if pad else r_o
        r_o_shift = jnp.concatenate([jnp.zeros((1, r.shape[1]), r.dtype), r_o_p[:-1]], 0)
        r = r_e - jnp.einsum("mab,mb->ma", lv["A"], r_o_shift) - jnp.einsum("mab,mb->ma", lv["C"], r_o_p)
        stack.append(r_o)
    chol, d, n_tail = tail
    x = jax.scipy.linalg.cho_solve((chol, False), r.reshape(-1) / d) / d
    x = x.reshape(n_tail, r.shape[1])
    # up sweep: recover the odd unknowns level by level
    for lv, r_o in zip(reversed(levels), reversed(stack)):
        n, n_odd = lv["n"], r_o.shape[0]
        x_e = x
        x_e_next = jnp.concatenate([x_e[1:], jnp.zeros((1, x.shape[1]), x.dtype)], 0)[:n_odd]
        x_o = jnp.einsum(
            "mab,mb->ma",
            lv["Do_inv"],
            r_o
            - jnp.einsum("mab,mb->ma", lv["Lo"], x_e[:n_odd])
            - jnp.einsum("mab,mb->ma", lv["LeT_next"], x_e_next),
        )
        x = jnp.zeros((n, x.shape[1]), x.dtype)
        x = x.at[0::2].set(x_e)
        x = x.at[1::2].set(x_o)
    return x


@functools.partial(jax.jit, static_argnames=("cfg", "window", "gn_iterations", "pcg_iterations"))
def optimize_window(
    cfg: BackendConfig,
    g: PoseGraph,
    window: int = 32,
    gn_iterations: int = 2,
    pcg_iterations: int = 8,
) -> PoseGraph:
    """Sliding-window GN: relinearize + solve only the last `window` nodes.

    The iSAM2 per-keyframe `update` role (imuPreintegration.cpp:305-332,
    mapOptmization.cpp:1835-1850): at keyframe rate only the recent states
    move — odometry/IMU/bias/GPS factors inside the window are solved exactly
    (block-tridiagonal cyclic reduction over W nodes, plus a few PCG
    iterations to absorb any in-window loop factors) with the node before the
    window held fixed as anchor. Cost is O(window), independent of the graph
    size; the full `optimize` runs only on loop events. Older nodes are
    untouched.
    """
    KF = cfg.max_keyframes
    dtype = g.t.dtype
    W = min(window, KF)
    start = jnp.maximum(g.n - W, 0)
    w_pos = start + jnp.arange(W)
    w_idx = jnp.minimum(w_pos, KF - 1)
    active = w_pos < g.n
    L = g.loop_i.shape[0]

    # fixed anchor = node start-1 (never moves; virtual identity when start==0)
    a_idx = jnp.maximum(start - 1, 0)
    anchor = (g.R[a_idx], g.t[a_idx], g.vel[a_idx], g.bg[a_idx], g.ba[a_idx])

    # in-window loop factors (both ends free)
    l_act = (jnp.arange(L) < g.n_loops) & (g.loop_i >= start) & (g.loop_j >= start)
    lwi = jnp.clip(g.loop_i - start, 0, W - 1)
    lwj = jnp.clip(g.loop_j - start, 0, W - 1)

    gpsw3 = (g.prior_info * g.prior_mask[:, None])[w_idx] * active[:, None]
    gps_pos_w = g.prior_pos[w_idx]

    # vel/bias observability inside the window (same pinning as optimize())
    imu_w = g.imu_mask[w_idx] & active
    imu_next = jnp.concatenate([imu_w[1:], jnp.zeros((1,), bool)])
    vb_obs = active & (imu_w | imu_next)

    def gn_step(carry, _):
        R, t, vel, bg, ba = carry
        Ri = jnp.concatenate([anchor[0][None], R[:-1]], 0)
        ti = jnp.concatenate([anchor[1][None], t[:-1]], 0)
        veli = jnp.concatenate([anchor[2][None], vel[:-1]], 0)
        bgi = jnp.concatenate([anchor[3][None], bg[:-1]], 0)
        bai = jnp.concatenate([anchor[4][None], ba[:-1]], 0)
        first_k = jnp.arange(W) == 0
        anchor_fixed = first_k & (start > 0)

        f_act = active & (w_idx >= 1)
        # odometry between factors at slots w_idx
        Ji6 = _between_jacobians(Ri, ti, R, t)
        e6 = _between_residual(Ri, ti, R, t, g.odom_R[w_idx], g.odom_t[w_idx])
        Ji_o, Jj_o = _pad_between(Ji6, W, dtype)
        e_o = jnp.zeros((W, RMAX), dtype).at[:, 0:6].set(e6)
        info_o = jnp.zeros((W, RMAX), dtype).at[:, 0:6].set(g.odom_info[w_idx] * f_act[:, None])

        # IMU + bias factors at slots w_idx
        i_act = f_act & g.imu_mask[w_idx]
        z15 = jnp.zeros((W, D), dtype)
        pim_w = jax.tree.map(lambda a: a[w_idx], g.imu_pim)
        jac = jax.vmap(
            jax.jacfwd(_imu_local_residual, argnums=(0, 1)),
            in_axes=(0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, None),
        )
        Ji_i9, Jj_i9 = jac(z15, z15, Ri, ti, veli, bgi, bai, R, t, vel, pim_w, g.grav)
        e9_i = jax.vmap(pre.residual, in_axes=(0,) * 9 + (None,))(
            pim_w, Ri, ti, veli, R, t, vel, bgi, bai, g.grav
        )
        info_i = g.imu_info[w_idx] * i_act[:, None]

        e6_b = jnp.concatenate([bg - bgi, ba - bai], axis=-1)
        Ji_b = jnp.zeros((W, RMAX, D), dtype).at[:, 0:6, 9:15].set(
            jnp.broadcast_to(-jnp.eye(6, dtype=dtype), (W, 6, 6))
        )
        Jj_b = jnp.zeros((W, RMAX, D), dtype).at[:, 0:6, 9:15].set(
            jnp.broadcast_to(jnp.eye(6, dtype=dtype), (W, 6, 6))
        )
        e_b = jnp.zeros((W, RMAX), dtype).at[:, 0:6].set(e6_b)
        info_b = jnp.zeros((W, RMAX), dtype).at[:, 0:6].set(g.bias_info[w_idx] * i_act[:, None])

        # the anchor node is fixed: zero its (i-side) Jacobians for factor 0
        fixm = jnp.where(anchor_fixed, 0.0, 1.0)[:, None, None]
        Ji_o, Ji_i9, Ji_b = Ji_o * fixm, Ji_i9 * fixm, Ji_b * fixm

        # in-window loop factors
        Ji6_l = _between_jacobians(R[lwi], t[lwi], R[lwj], t[lwj])
        e6_l = _between_residual(R[lwi], t[lwi], R[lwj], t[lwj], g.loop_R, g.loop_t)
        chi2 = jnp.sum(e6_l * e6_l * g.loop_info, axis=-1)
        c2 = cfg.loop_cauchy_c ** 2
        w_rob = jnp.where(g.loop_robust, c2 / (c2 + chi2), 1.0)
        Ji_l, Jj_l = _pad_between(Ji6_l, L, dtype)
        e_l = jnp.zeros((L, RMAX), dtype).at[:, 0:6].set(e6_l)
        info_l = jnp.zeros((L, RMAX), dtype).at[:, 0:6].set(g.loop_info * (l_act * w_rob)[:, None])

        fi_seq = jnp.maximum(jnp.arange(W) - 1, 0)
        fj_seq = jnp.arange(W)
        fi = jnp.concatenate([fi_seq, lwi, fi_seq, fi_seq])
        fj = jnp.concatenate([fj_seq, lwj, fj_seq, fj_seq])
        Ji = jnp.concatenate([Ji_o, Ji_l, Ji_i9, Ji_b], axis=0)
        Jj = jnp.concatenate([Jj_o, Jj_l, Jj_i9, Jj_b], axis=0)
        e = jnp.concatenate([e_o, e_l, e9_i, e_b], axis=0)
        info = jnp.concatenate([info_o, info_l, info_i, info_b], axis=0)

        pose_prior = jnp.where((w_idx == 0) & active, cfg.prior_info, jnp.where(active, 0.0, 1.0))
        vb_prior = jnp.where(
            (w_idx == 0) & active, jnp.maximum(cfg.prior_info * 1e-4, 1.0), jnp.where(vb_obs, 0.0, 1.0)
        )
        prior_diag = jnp.concatenate(
            [jnp.repeat(pose_prior[:, None], 6, axis=1), jnp.repeat(vb_prior[:, None], 9, axis=1)], axis=1
        )
        gpsw = jnp.zeros((W, D), dtype).at[:, 3:6].set(gpsw3)
        prior_diag = prior_diag + gpsw

        w_e = info * e
        b = jnp.zeros((W, D), dtype)
        b = b.at[fi].add(jnp.einsum("fba,fb->fa", Ji, w_e))
        b = b.at[fj].add(jnp.einsum("fba,fb->fa", Jj, w_e))
        gps_r = jnp.einsum("kij,kj->ki", jnp.swapaxes(R, -1, -2), gps_pos_w - t)
        b = b - gpsw * jnp.zeros((W, D), dtype).at[:, 3:6].set(gps_r)

        Dblk = _precond_blocks(W, dtype, fi, fj, Ji, Jj, info, prior_diag)
        B = _offdiag_blocks(W, dtype, jnp.arange(W), (Ji_o, Ji_i9, Ji_b), (Jj_o, Jj_i9, Jj_b),
                            (info_o, info_i, info_b))
        levels, top_inv = chain_factor(Dblk, B)

        def hv(v):
            return _hv(fi, fj, Ji, Jj, info, prior_diag, v)

        x = jnp.zeros((W, D), dtype)
        r = -b - hv(x)
        z = chain_solve(levels, top_inv, r)
        p = z
        rz = jnp.sum(r * z)

        def pcg(carry, _):
            x, r, p, rz = carry
            Ap = hv(p)
            denom = jnp.sum(p * Ap)
            alpha = rz / jnp.where(jnp.abs(denom) < 1e-20, 1e-20, denom)
            x = x + alpha * p
            r = r - alpha * Ap
            z = chain_solve(levels, top_inv, r)
            rz_new = jnp.sum(r * z)
            beta = rz_new / jnp.where(jnp.abs(rz) < 1e-20, 1e-20, rz)
            p = z + beta * p
            return (x, r, p, rz_new), None

        (dx, _, _, _), _ = jax.lax.scan(pcg, (x, r, p, rz), None, length=pcg_iterations)
        dx = jnp.where(active[:, None], dx, 0.0)
        # window trust region (tighter than optimize()'s — see config note)
        step_max = jnp.max(jnp.abs(dx[:, 0:6]))
        dx = dx * jnp.minimum(1.0, cfg.window_max_step / jnp.maximum(step_max, 1e-12))
        R2 = R @ so3.exp(dx[:, 0:3])
        t2 = t + jnp.einsum("kij,kj->ki", R, dx[:, 3:6])
        return (R2, t2, vel + dx[:, 6:9], bg + dx[:, 9:12], ba + dx[:, 12:15]), None

    carry0 = (g.R[w_idx], g.t[w_idx], g.vel[w_idx], g.bg[w_idx], g.ba[w_idx])
    (R, t, vel, bg, ba), _ = jax.lax.scan(gn_step, carry0, None, length=gn_iterations)
    tgt = jnp.where(active, w_idx, KF)
    return g._replace(
        R=g.R.at[tgt].set(R, mode="drop"),
        t=g.t.at[tgt].set(t, mode="drop"),
        vel=g.vel.at[tgt].set(vel, mode="drop"),
        bg=g.bg.at[tgt].set(bg, mode="drop"),
        ba=g.ba.at[tgt].set(ba, mode="drop"),
    )


def residual_stats(cfg: BackendConfig, g: PoseGraph):
    """Whitened residual diagnostics over all active factors: (chi2 total,
    rms). The convergence metric VERDICT r2 weak #3 asked for — run after
    optimize() and compare across GN sweeps / PCG budgets."""
    fi, fj, Ji, Jj, e, info, _ = _graph_terms(cfg, g)
    chi2 = jnp.sum(info * e * e)
    n_rows = jnp.maximum(jnp.sum(info > 0), 1)
    return chi2, jnp.sqrt(chi2 / n_rows.astype(e.dtype))


@functools.partial(jax.jit, static_argnames=("cfg", "gn_iterations", "pcg_iterations"))
def optimize(cfg: BackendConfig, g: PoseGraph, gn_iterations: Optional[int] = None,
             pcg_iterations: Optional[int] = None) -> PoseGraph:
    """Batch GN over the whole graph (the correctPoses moment).

    Node 0 carries a huge prior (gauge); inactive slots get unit priors so H
    stays non-singular without affecting active nodes. Velocity/bias blocks of
    nodes untouched by any IMU factor are pinned the same way, so odom-only
    graphs reproduce the pose-only solve exactly.

    `gn_iterations` overrides cfg.gn_iterations — the deferred loop-event
    solve (slam.py) runs ONE relinearize+chain+PCG sweep per frame so a 5k
    graph never stalls the pipeline for the full solve (the reference spreads
    this cost the same way: iSAM2 incremental updates on the mapping thread,
    mapOptmization.cpp:1835-1850). `pcg_iterations` likewise overrides the
    per-sweep PCG budget — the drain SLICE: more sweeps of fewer iterations
    deliver the same total Krylov work at a bounded per-frame stall (the
    relinearize+factor overhead per sweep is ~5 ms at 5k nodes after the
    NS-inverse/hybrid-tail work, so slicing is cheap)."""
    KF = cfg.max_keyframes
    dtype = g.t.dtype
    idx = jnp.arange(KF)
    active = idx < jnp.maximum(g.n, 1)
    # a node's vel/bias are observable iff an IMU factor touches it
    imu_next = jnp.concatenate([g.imu_mask[1:], jnp.zeros((1,), bool)])
    vb_obs = active & (g.imu_mask | imu_next)

    def gn_step(g, _):
        fi, fj, Ji, Jj, e, info, B = _graph_terms(cfg, g)
        pose_prior = jnp.where((idx == 0) & active, cfg.prior_info, jnp.where(active, 0.0, 1.0))
        vb_prior = jnp.where(
            (idx == 0) & active, jnp.maximum(cfg.prior_info * 1e-4, 1.0), jnp.where(vb_obs, 0.0, 1.0)
        )
        prior_diag = jnp.concatenate(
            [
                jnp.repeat(pose_prior[:, None], 6, axis=1),
                jnp.repeat(vb_prior[:, None], 9, axis=1),
            ],
            axis=1,
        )
        # gps position priors add to the translation block (rows 3:6)
        gpsw3 = g.prior_info * g.prior_mask[:, None]
        gpsw = jnp.zeros((KF, D), dtype).at[:, 3:6].set(gpsw3)
        prior_diag = prior_diag + gpsw

        # b = sum_f J^T W e  (+ gps residual terms)
        w_e = info * e
        b = jnp.zeros((KF, D), dtype)
        b = b.at[fi].add(jnp.einsum("fba,fb->fa", Ji, w_e))
        b = b.at[fj].add(jnp.einsum("fba,fb->fa", Jj, w_e))
        # gps residual r = R^T (p_gps - t) under t' = t + R dt -> J_dt = -I
        gps_r = jnp.einsum("kij,kj->ki", jnp.swapaxes(g.R, -1, -2), g.prior_pos - g.t)
        b = b - gpsw * jnp.zeros((KF, D), dtype).at[:, 3:6].set(gps_r)

        Dblk = _precond_blocks(KF, dtype, fi, fj, Ji, Jj, info, prior_diag)
        levels, top_inv = chain_factor(Dblk, B)

        def hv(v):
            return _hv(fi, fj, Ji, Jj, info, prior_diag, v)

        # PCG on H dx = -b, preconditioned by the EXACT chain solve: the
        # trajectory backbone is handled directly, PCG only has to absorb
        # the loop-closure corrections (iterations ~ loops, not keyframes)
        x = jnp.zeros((KF, D), dtype)
        r = -b - hv(x)
        z = chain_solve(levels, top_inv, r)
        p = z
        rz = jnp.sum(r * z)

        def pcg(carry, _):
            x, r, p, rz = carry
            Ap = hv(p)
            denom = jnp.sum(p * Ap)
            alpha = rz / jnp.where(jnp.abs(denom) < 1e-20, 1e-20, denom)
            x = x + alpha * p
            r = r - alpha * Ap
            z = chain_solve(levels, top_inv, r)
            rz_new = jnp.sum(r * z)
            beta = rz_new / jnp.where(jnp.abs(rz) < 1e-20, 1e-20, rz)
            p = z + beta * p
            return (x, r, p, rz_new), None

        n_pcg = cfg.pcg_iterations if pcg_iterations is None else pcg_iterations
        (dx, r, p, rz), _ = jax.lax.scan(pcg, (x, r, p, rz), None, length=n_pcg)
        dx = jnp.where(active[:, None], dx, 0.0)
        # trust region: scale the WHOLE step so the largest per-node pose
        # update stays under cfg.max_step — an undamped GN sweep on a graph
        # with conflicting loop/odometry factors can overshoot unboundedly
        # (observed: 1.6e5 m on a 493-node revisit graph). Direction is
        # preserved; a large correction is simply delivered over several
        # sweeps, the role iSAM2's bounded incremental updates play in the
        # reference (mapOptmization.cpp:1835-1850).
        step_max = jnp.max(jnp.abs(dx[:, 0:6]))
        scale = jnp.minimum(1.0, cfg.max_step / jnp.maximum(step_max, 1e-12))
        dx = dx * scale
        # right-multiplicative retraction per node
        R_new = g.R @ so3.exp(dx[:, 0:3])
        t_new = g.t + jnp.einsum("kij,kj->ki", g.R, dx[:, 3:6])
        vel_new = g.vel + dx[:, 6:9]
        bg_new = g.bg + dx[:, 9:12]
        ba_new = g.ba + dx[:, 12:15]
        return g._replace(R=R_new, t=t_new, vel=vel_new, bg=bg_new, ba=ba_new), None

    n_iters = cfg.gn_iterations if gn_iterations is None else gn_iterations
    g, _ = jax.lax.scan(gn_step, g, None, length=n_iters)
    return g
