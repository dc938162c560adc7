"""Iterated error-state Kalman filter on the 23-DoF manifold, pure JAX.

Behavioral parity target (math re-derived for dense 23x23 block algebra):
  reference `src/jueying_lio/include/IKFoM_toolkit/esekfom/esekfom.hpp`
  - `predict` (:269-374): manifold oplus + covariance transport with the
    SO(3) A-matrix row transport and the S2 Nx/Mx projection,
  - `update_iterated_dyn_share_modified` (:1526-1860): the small-state path
    K = (H^T H + (P/R)^-1)^-1 H^T with H restricted to the first 12 error
    dims, iterated with manifold-projected P and the final
    P = L - K_x P' covariance update.

The process model is `src/jueying_lio/include/use-ikfom.hpp:35-72`
(get_f / df_dx / df_dw).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ...geom import s2, so3
from . import state as st

_H_COLS = 12  # measurement Jacobian covers pos/rot/ext_R/ext_t only


def process_noise_cov(
    dtype=jnp.float32,
    gyr_cov: float = 1e-4,
    acc_cov: float = 1e-4,
    b_gyr_cov: float = 1e-5,
    b_acc_cov: float = 1e-5,
) -> jnp.ndarray:
    """Q (12x12): gyro, accel, gyro-bias, accel-bias noise
    (use-ikfom.hpp:21-33 defaults; overridable by the per-lidar YAML
    mapping.acc_cov/gyr_cov/b_acc_cov/b_gyr_cov)."""
    d = jnp.concatenate(
        [jnp.full(3, gyr_cov), jnp.full(3, acc_cov), jnp.full(3, b_gyr_cov), jnp.full(3, b_acc_cov)]
    ).astype(dtype)
    return jnp.diag(d)


def init_P(dtype=jnp.float32) -> jnp.ndarray:
    """Initial covariance (imu_processing.hpp IMUInit: identity with small
    extrinsic/gravity blocks)."""
    P = jnp.eye(st.DOF, dtype=dtype)
    P = P.at[st.EXT_R:st.EXT_R + 3, st.EXT_R:st.EXT_R + 3].set(jnp.eye(3, dtype=dtype) * 1e-5)
    P = P.at[st.EXT_T:st.EXT_T + 3, st.EXT_T:st.EXT_T + 3].set(jnp.eye(3, dtype=dtype) * 1e-5)
    P = P.at[st.GRAV:st.GRAV + 2, st.GRAV:st.GRAV + 2].set(jnp.eye(2, dtype=dtype) * 1e-5)
    return P


def predict(x: st.NavState, P: jnp.ndarray, acc: jnp.ndarray, gyro: jnp.ndarray, dt, Q: jnp.ndarray):
    """One forward propagation step with IMU input (esekfom.hpp predict).

    Returns (x', P'). All small fixed-size matrix algebra — negligible cost,
    run under lax.scan over the frame's IMU samples.
    """
    dtype = P.dtype
    omega = gyro - x.bg
    acc_b = acc - x.ba
    a_world = x.rot @ acc_b + x.grav  # f rows 12:15

    # manifold oplus with f * dt (state advanced with OLD state's f)
    x_new = st.NavState(
        pos=x.pos + x.vel * dt,
        rot=x.rot @ so3.exp(omega * dt),
        ext_R=x.ext_R,
        ext_t=x.ext_t,
        vel=x.vel + a_world * dt,
        bg=x.bg,
        ba=x.ba,
        grav=x.grav,
    )

    # error-state transition Fx (23x23) and noise Jacobian Fw (23x12).
    # rows of rot-like blocks are transported by A(-omega dt) (esekfom.hpp:305-324)
    seg_rot = -omega * dt
    A_rot = so3.A_matrix(seg_rot)
    Fx = jnp.eye(st.DOF, dtype=dtype)
    Fx = Fx.at[st.POS:st.POS + 3, st.VEL:st.VEL + 3].set(jnp.eye(3, dtype=dtype) * dt)
    Fx = Fx.at[st.ROT:st.ROT + 3, st.ROT:st.ROT + 3].set(so3.exp(seg_rot))
    Fx = Fx.at[st.ROT:st.ROT + 3, st.BG:st.BG + 3].set(-dt * A_rot)
    Fx = Fx.at[st.VEL:st.VEL + 3, st.ROT:st.ROT + 3].set(-dt * x.rot @ so3.hat(acc_b))
    Fx = Fx.at[st.VEL:st.VEL + 3, st.BA:st.BA + 3].set(-dt * x.rot)
    Mx = s2.mx(x.grav, jnp.zeros(2, dtype))  # (3, 2), delta = 0
    Fx = Fx.at[st.VEL:st.VEL + 3, st.GRAV:st.GRAV + 2].set(dt * Mx)
    # grav diagonal block: Nx(g) Exp(0) Mx(g, 0) == I2 (no gravity dynamics)

    Fw = jnp.zeros((st.DOF, 12), dtype)
    Fw = Fw.at[st.ROT:st.ROT + 3, 0:3].set(-dt * A_rot)
    Fw = Fw.at[st.VEL:st.VEL + 3, 3:6].set(-dt * x.rot)
    Fw = Fw.at[st.BG:st.BG + 3, 6:9].set(dt * jnp.eye(3, dtype=dtype))
    Fw = Fw.at[st.BA:st.BA + 3, 9:12].set(dt * jnp.eye(3, dtype=dtype))

    P_new = Fx @ P @ Fx.T + Fw @ Q @ Fw.T
    P_new = 0.5 * (P_new + P_new.T)
    return x_new, P_new


def _transport(dx: jnp.ndarray, x: st.NavState, x_prop: st.NavState, dtype) -> jnp.ndarray:
    """Block-diagonal tangent transport T(dx) (23x23): A(dx_blk)^T for the
    SO(3) blocks, Nx(x) Mx(x_prop, dx_blk) for the S2 block, identity elsewhere
    (esekfom.hpp:1560-1601)."""
    T = jnp.eye(st.DOF, dtype=dtype)
    A1 = jnp.swapaxes(so3.A_matrix(dx[st.ROT:st.ROT + 3]), -1, -2)
    A2 = jnp.swapaxes(so3.A_matrix(dx[st.EXT_R:st.EXT_R + 3]), -1, -2)
    T = T.at[st.ROT:st.ROT + 3, st.ROT:st.ROT + 3].set(A1)
    T = T.at[st.EXT_R:st.EXT_R + 3, st.EXT_R:st.EXT_R + 3].set(A2)
    Nx = s2.nx_yy(x.grav)
    Mx = s2.mx(x_prop.grav, dx[st.GRAV:st.GRAV + 2])
    T = T.at[st.GRAV:st.GRAV + 2, st.GRAV:st.GRAV + 2].set(Nx @ Mx)
    return T


class UpdateResult(NamedTuple):
    x: st.NavState
    P: jnp.ndarray
    iterations: jnp.ndarray
    converged: jnp.ndarray
    cache: tuple = ()  # final correspondence cache from obs_fn (reference
    # Nearest_Points role: MapIncremental reuses the last search's neighbors)


def update_iterated(
    x0: st.NavState,
    P0: jnp.ndarray,
    obs_fn: Callable,
    R: float,
    max_iter: int = 4,
    epsi: float = 0.001,
    reduce: Optional[Callable] = None,
    research: bool = True,
) -> UpdateResult:
    """Iterated measurement update, small-state path (n <= measurements).

    obs_fn(x, do_search, cache) -> (h_x (N, 12), h (N,), mask (N,), cache):
    the point-to-plane observation model; `do_search` mirrors the reference's
    `ekfom_data.converge` flag gating the NN re-search (laser_mapping.cc:618),
    `cache` carries correspondence state between iterations.

    The initial cache is a zero-filled pytree of the correct structure
    (obtained by abstract evaluation — no device compute); the first scan
    iteration runs with do_search=True and performs the only initial search.

    `reduce` is applied to the (HTH, HTh) pair after the local point
    reduction — the point-axis sharding hook (parallel.sharded_lio passes a
    psum over the mesh axis so each device only linearizes its point chunk;
    every other term is replicated small-state math).
    """
    dtype = P0.dtype
    # structure-only evaluation: never executes the search on device
    cache_aval = jax.eval_shape(lambda x: obs_fn(x, jnp.asarray(True), None)[3], x0)
    cache0 = jax.tree.map(lambda a: jnp.zeros(a.shape, a.dtype), cache_aval)

    def body(carry, it):
        x, done, do_search, t_conv, cache, P_out = carry
        h_x, h, mask, cache = obs_fn(x, do_search & ~done, cache)
        m = mask.astype(dtype)
        h_x = h_x * m[:, None]
        h = h * m

        dx = st.boxminus(x, x0)
        T = _transport(dx, x, x0, dtype)
        dx_new = T @ dx
        P = T @ P0 @ T.T

        HTH = h_x.T @ h_x  # (12, 12) — MXU reduction over points
        HTh = h_x.T @ h
        if reduce is not None:
            HTH, HTh = reduce((HTH, HTh))
        P_temp = jnp.linalg.inv(P / R)
        P_temp = P_temp.at[:_H_COLS, :_H_COLS].add(HTH)
        P_inv = jnp.linalg.inv(P_temp)
        K_h = P_inv[:, :_H_COLS] @ HTh
        K_x12 = P_inv[:, :_H_COLS] @ HTH  # (23, 12)

        # dx = K_h + (K_x - I) dx_new, with K_x nonzero only in its first 12 cols
        dx_ = K_h + K_x12 @ dx_new[:_H_COLS] - dx_new
        x_new = st.boxplus(x, dx_)
        x = jax.tree.map(lambda a, b: jnp.where(done, a, b), x, x_new)
        conv = jnp.all(jnp.abs(dx_) < epsi)
        t_conv = t_conv + jnp.where(conv & ~done, 1, 0)
        # re-search next iteration when this one converged (reference
        # semantics, laser_mapping.cc:618 via ekfom_data.converge); with
        # research=False the first iteration's correspondences are reused for
        # the whole update — one kNN pass per frame instead of two/three
        do_search = conv if research else (conv & False)
        finish = (t_conv > 1) | (it == max_iter - 1)

        # final covariance at the finishing iteration: the asymmetric row/column
        # transports of esekfom.hpp:1737-1860, as one matrix expression:
        #   P_final = T2 P T2^T - (T2 K_x)[:, :12] (P T2^T)[:12, :]
        T2 = _transport(dx_, x_new, x0, dtype)
        L = T2 @ P @ T2.T
        P_cols = P @ T2.T
        P_fin = L - (T2 @ K_x12) @ P_cols[:_H_COLS, :]
        P_fin = 0.5 * (P_fin + P_fin.T)
        P_out = jnp.where(done, P_out, P_fin)
        return (x, done | finish, do_search, t_conv, cache, P_out), None

    zero = jnp.sum(P0) * 0
    init = (
        x0,
        zero > 1.0,
        zero <= 1.0,
        zero.astype(jnp.int32),
        cache0,
        P0 + zero,
    )
    (x, done, _, t_conv, cache, P_new), _ = jax.lax.scan(body, init, jnp.arange(max_iter, dtype=jnp.int32))
    return UpdateResult(x, P_new, t_conv, done, cache)
