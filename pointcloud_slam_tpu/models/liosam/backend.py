"""Pose-graph back-end: keyframe store + factors + GN with matrix-free PCG.

Behavioral parity target (same factors and gating; solver re-designed):
  reference `src/jueying_slam/src/mapOptmization.cpp`
  - keyframe gating by motion thresholds (`saveKeyFramesAndFactor` :1637-1884),
  - `addOdomFactor` (:1658): between factors on consecutive keyframes,
  - `addGPSFactor` (:1678): position priors,
  - `addLoopFactor` (:1757): loop-closure between factors,
  - iSAM2 incremental smoothing -> replaced by batched Gauss-Newton over the
    whole graph with a Jacobi(block)-preconditioned conjugate-gradient solve
    of the normal equations. Matrix-free: H v is accumulated factor-by-factor
    with gathers/scatter-adds — no sparse matrix is ever materialized
    (BASELINE.json's "sparse LM with PCG on the Schur complement" role).
  - `correctPoses` (:1886-1917): the solved poses rewrite the keyframe store.

Between-factor linearization uses right perturbations with Jr^-1 ~ I and the
exact SE(3) adjoint — the standard pose-graph GN approximation; outer GN
iterations absorb the higher-order terms.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ...geom import se3, so3


@dataclasses.dataclass(frozen=True)
class BackendConfig:
    max_keyframes: int = 2048
    max_loops: int = 256
    gn_iterations: int = 6
    pcg_iterations: int = 60
    keyframe_angle_thresh: float = 0.2     # rad (surroundingkeyframeAddingAngleThreshold)
    keyframe_dist_thresh: float = 1.0      # m  (surroundingkeyframeAddingDistThreshold)
    prior_info: float = 1e8                # gauge prior on node 0


class PoseGraph(NamedTuple):
    # nodes
    R: jnp.ndarray          # (KF, 3, 3)
    t: jnp.ndarray          # (KF, 3)
    n: jnp.ndarray          # () int32 active keyframes
    # odometry between factor i-1 -> i (slot i; slot 0 unused)
    odom_R: jnp.ndarray     # (KF, 3, 3)
    odom_t: jnp.ndarray     # (KF, 3)
    odom_info: jnp.ndarray  # (KF, 6) diagonal information
    # loop factors i -> j
    loop_i: jnp.ndarray     # (L,)
    loop_j: jnp.ndarray     # (L,)
    loop_R: jnp.ndarray     # (L, 3, 3)
    loop_t: jnp.ndarray     # (L, 3)
    loop_info: jnp.ndarray  # (L, 6)
    n_loops: jnp.ndarray    # ()
    # position priors (GPS)
    prior_mask: jnp.ndarray  # (KF,)
    prior_pos: jnp.ndarray   # (KF, 3)
    prior_info: jnp.ndarray  # (KF, 3)


def create(cfg: BackendConfig, dtype=jnp.float32) -> PoseGraph:
    KF, L = cfg.max_keyframes, cfg.max_loops
    eye = jnp.broadcast_to(jnp.eye(3, dtype=dtype), (KF, 3, 3))
    return PoseGraph(
        R=eye, t=jnp.zeros((KF, 3), dtype), n=jnp.zeros((), jnp.int32),
        odom_R=eye, odom_t=jnp.zeros((KF, 3), dtype), odom_info=jnp.zeros((KF, 6), dtype),
        loop_i=jnp.zeros((L,), jnp.int32), loop_j=jnp.zeros((L,), jnp.int32),
        loop_R=jnp.broadcast_to(jnp.eye(3, dtype=dtype), (L, 3, 3)), loop_t=jnp.zeros((L, 3), dtype),
        loop_info=jnp.zeros((L, 6), dtype), n_loops=jnp.zeros((), jnp.int32),
        prior_mask=jnp.zeros((KF,), bool), prior_pos=jnp.zeros((KF, 3), dtype),
        prior_info=jnp.zeros((KF, 3), dtype),
    )


def should_add_keyframe(cfg: BackendConfig, g: PoseGraph, R_new, t_new):
    """Motion gating vs the last keyframe (saveKeyFramesAndFactor :1637)."""
    last = jnp.maximum(g.n - 1, 0)
    dR = so3.boxminus(R_new, g.R[last])
    dt = t_new - g.t[last]
    move = (jnp.max(jnp.abs(dR)) > cfg.keyframe_angle_thresh) | (jnp.linalg.norm(dt) > cfg.keyframe_dist_thresh)
    return move | (g.n == 0)


def add_keyframe(cfg: BackendConfig, g: PoseGraph, R_new, t_new, odom_info_diag=None) -> PoseGraph:
    """Append a node + odometry between factor from the previous node."""
    if odom_info_diag is None:
        odom_info_diag = jnp.full((6,), 1e4, g.t.dtype)
    i = jnp.minimum(g.n, cfg.max_keyframes - 1)
    last = jnp.maximum(g.n - 1, 0)
    relR = jnp.swapaxes(g.R[last], -1, -2) @ R_new
    relt = jnp.einsum("ij,j->i", jnp.swapaxes(g.R[last], -1, -2), t_new - g.t[last])
    first = g.n == 0
    return g._replace(
        R=g.R.at[i].set(R_new),
        t=g.t.at[i].set(t_new),
        odom_R=g.odom_R.at[i].set(jnp.where(first, jnp.eye(3, dtype=g.t.dtype), relR)),
        odom_t=g.odom_t.at[i].set(jnp.where(first, jnp.zeros(3, g.t.dtype), relt)),
        odom_info=g.odom_info.at[i].set(jnp.where(first, jnp.zeros(6, g.t.dtype), odom_info_diag)),
        n=jnp.minimum(g.n + 1, cfg.max_keyframes),
    )


def add_loop(cfg: BackendConfig, g: PoseGraph, i, j, relR, relt, info_diag) -> PoseGraph:
    k = jnp.minimum(g.n_loops, cfg.max_loops - 1)
    return g._replace(
        loop_i=g.loop_i.at[k].set(i),
        loop_j=g.loop_j.at[k].set(j),
        loop_R=g.loop_R.at[k].set(relR),
        loop_t=g.loop_t.at[k].set(relt),
        loop_info=g.loop_info.at[k].set(info_diag),
        n_loops=jnp.minimum(g.n_loops + 1, cfg.max_loops),
    )


def add_gps(g: PoseGraph, i, pos, info_diag) -> PoseGraph:
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


def _graph_terms(cfg: BackendConfig, g: PoseGraph):
    """Assemble per-factor (i, j, J_i, e, info) arrays for odometry + loops.

    Every between factor contributes rows [J_i | I] on nodes (i, j).
    """
    KF = cfg.max_keyframes
    dtype = g.t.dtype
    idx = jnp.arange(KF)
    # odometry factors at slots 1..n-1 (i = k-1, j = k)
    o_act = (idx >= 1) & (idx < g.n)
    oi = jnp.maximum(idx - 1, 0)
    oj = idx
    Ji_o = _between_jacobians(g.R[oi], g.t[oi], g.R[oj], g.t[oj])
    e_o = _between_residual(g.R[oi], g.t[oi], g.R[oj], g.t[oj], g.odom_R, g.odom_t)
    info_o = g.odom_info * o_act[:, None]
    # loop factors
    l_act = jnp.arange(g.loop_i.shape[0]) < g.n_loops
    li, lj = g.loop_i, g.loop_j
    Ji_l = _between_jacobians(g.R[li], g.t[li], g.R[lj], g.t[lj])
    e_l = _between_residual(g.R[li], g.t[li], g.R[lj], g.t[lj], g.loop_R, g.loop_t)
    info_l = g.loop_info * l_act[:, None]
    fi = jnp.concatenate([oi, li])
    fj = jnp.concatenate([oj, lj])
    Ji = jnp.concatenate([Ji_o, Ji_l], axis=0)
    e = jnp.concatenate([e_o, e_l], axis=0)
    info = jnp.concatenate([info_o, info_l], axis=0)
    return fi, fj, Ji, e, info


def _hv(cfg, g, fi, fj, Ji, info, prior_diag, v):
    """Matrix-free H @ v over all factors. v (KF, 6) -> (KF, 6)."""
    vi = v[fi]
    vj = v[fj]
    # factor row value: J_i v_i + I v_j
    fv = jnp.einsum("fab,fb->fa", Ji, vi) + vj
    w = info * fv
    out = jnp.zeros_like(v)
    out = out.at[fj].add(w)
    out = out.at[fi].add(jnp.einsum("fba,fb->fa", Ji, w))
    return out + prior_diag * v


def _precond_blocks(cfg, g, fi, fj, Ji, info, prior_diag):
    """Block-diagonal of H (KF, 6, 6) and its inverse."""
    KF = cfg.max_keyframes
    dtype = g.t.dtype
    JtWJ_i = jnp.einsum("fba,fb,fbc->fac", Ji, info, Ji)
    blocks = jnp.zeros((KF, 6, 6), dtype)
    blocks = blocks.at[fi].add(JtWJ_i)
    diag_j = jax.vmap(jnp.diag)(info)
    blocks = blocks.at[fj].add(diag_j)
    blocks = blocks + jax.vmap(jnp.diag)(prior_diag)
    blocks = blocks + 1e-6 * jnp.eye(6, dtype=dtype)
    inv = jnp.linalg.inv(blocks)
    return inv


@functools.partial(jax.jit, static_argnames=("cfg",))
def optimize(cfg: BackendConfig, g: PoseGraph) -> PoseGraph:
    """Batch GN over the whole graph (the correctPoses moment).

    Node 0 carries a huge prior (gauge); inactive slots get unit priors so H
    stays non-singular without affecting active nodes.
    """
    KF = cfg.max_keyframes
    dtype = g.t.dtype
    idx = jnp.arange(KF)
    active = idx < jnp.maximum(g.n, 1)

    def gn_step(g, _):
        fi, fj, Ji, e, info = _graph_terms(cfg, g)
        prior_diag = jnp.where(
            (idx == 0)[:, None], cfg.prior_info, jnp.where(active[:, None], 0.0, 1.0)
        ) * jnp.ones((KF, 6), dtype)
        # gps position priors add to the translation block
        gpsw = jnp.concatenate([jnp.zeros((KF, 3), dtype), g.prior_info * g.prior_mask[:, None]], axis=1)
        prior_diag = prior_diag + gpsw

        # b = sum_f J^T W e  (+ gps residual terms)
        w_e = info * e
        b = jnp.zeros((KF, 6), dtype)
        b = b.at[fj].add(w_e)
        b = b.at[fi].add(jnp.einsum("fba,fb->fa", Ji, w_e))
        gps_r = jnp.einsum("kij,kj->ki", jnp.swapaxes(g.R, -1, -2), g.prior_pos - g.t)  # body-frame position error
        b = b - gpsw * jnp.concatenate([jnp.zeros((KF, 3), dtype), gps_r], axis=1)

        Minv = _precond_blocks(cfg, g, fi, fj, Ji, info, prior_diag)

        def hv(v):
            return _hv(cfg, g, fi, fj, Ji, info, prior_diag, v)

        # PCG on H dx = -b
        x = jnp.zeros((KF, 6), dtype)
        r = -b - hv(x)
        z = jnp.einsum("kab,kb->ka", Minv, r)
        p = z
        rz = jnp.sum(r * z)

        def pcg(carry, _):
            x, r, p, rz = carry
            Ap = hv(p)
            denom = jnp.sum(p * Ap)
            alpha = rz / jnp.where(jnp.abs(denom) < 1e-20, 1e-20, denom)
            x = x + alpha * p
            r = r - alpha * Ap
            z = jnp.einsum("kab,kb->ka", Minv, r)
            rz_new = jnp.sum(r * z)
            beta = rz_new / jnp.where(jnp.abs(rz) < 1e-20, 1e-20, rz)
            p = z + beta * p
            return (x, r, p, rz_new), None

        (dx, r, p, rz), _ = jax.lax.scan(pcg, (x, r, p, rz), None, length=cfg.pcg_iterations)
        dx = jnp.where(active[:, None], dx, 0.0)
        # right-multiplicative retraction per node
        R_new = g.R @ so3.exp(dx[:, :3])
        t_new = g.t + jnp.einsum("kij,kj->ki", g.R, dx[:, 3:])
        return g._replace(R=R_new, t=t_new), None

    g, _ = jax.lax.scan(gn_step, g, None, length=cfg.gn_iterations)
    return g
