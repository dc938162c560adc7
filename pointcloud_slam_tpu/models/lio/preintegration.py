"""IMU preintegration (Forster-style deltas) + failure detection.

Behavioral parity target:
  reference `src/jueying_slam/src/imuPreintegration.cpp`
  - gtsam `PreintegratedImuMeasurements` dual integrators (opt + realtime,
    :199-202): here one pure function producing the preintegrated deltas
    (dR, dv, dp) with first-order bias Jacobians — usable both as a between
    constraint and for IMU-rate forward prediction (`fusion.predict_poses`),
  - `failureDetection` (:440-458): velocity / bias magnitude gates that
    trigger an optimizer reset,
  - the 100-key sliding reset and covariance-triggered reset are carried by
    the caller (host control flow around `lio.reset`).

The preintegrated delta is the measurement of a motion factor between two
states: r = [Log(dR(b)^T R_i^T R_j), R_i^T(v_j - v_i - g dt) - dv(b),
R_i^T(p_j - p_i - v_i dt - 0.5 g dt^2) - dp(b)] with dX(b) corrected to
first order in the bias deviation via the stored Jacobians.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ...geom import so3


class PreintegratedImu(NamedTuple):
    dR: jnp.ndarray      # (3, 3) rotation delta at the linearization bias
    dv: jnp.ndarray      # (3,)
    dp: jnp.ndarray      # (3,)
    dt: jnp.ndarray      # () total time
    # first-order bias Jacobians
    dR_dbg: jnp.ndarray  # (3, 3) d Log(dR) / d bg
    dv_dbg: jnp.ndarray  # (3, 3)
    dv_dba: jnp.ndarray  # (3, 3)
    dp_dbg: jnp.ndarray  # (3, 3)
    dp_dba: jnp.ndarray  # (3, 3)
    bg0: jnp.ndarray     # (3,) linearization gyro bias
    ba0: jnp.ndarray     # (3,) linearization accel bias


@jax.jit
def preintegrate(imu_acc, imu_gyro, imu_dt, imu_mask, bg0, ba0) -> PreintegratedImu:
    """Integrate a frame's IMU samples into a relative-motion pseudo-measurement.

    imu_* are (M, 3)/(M,); masked samples are skipped. Gravity is NOT removed
    here (the factor residual subtracts g dt terms), matching the gtsam
    convention the reference relies on.
    """
    dtype = imu_acc.dtype
    eye = jnp.eye(3, dtype=dtype)

    def step(c, inp):
        dR, dv, dp, T, dR_dbg, dv_dbg, dv_dba, dp_dbg, dp_dba = c
        acc, gyro, dt, m = inp
        a = acc - ba0
        w = gyro - bg0
        dRk = so3.exp(w * dt)
        Jr = so3.A_matrix(-w * dt)  # right Jacobian of Exp(w dt)
        dp_n = dp + dv * dt + 0.5 * (dR @ a) * dt * dt
        dv_n = dv + (dR @ a) * dt
        # bias Jacobians (standard preintegration recursions)
        dp_dba_n = dp_dba + dv_dba * dt - 0.5 * dR * dt * dt
        dp_dbg_n = dp_dbg + dv_dbg * dt - 0.5 * (dR @ so3.hat(a)) @ dR_dbg * dt * dt
        dv_dba_n = dv_dba - dR * dt
        dv_dbg_n = dv_dbg - (dR @ so3.hat(a)) @ dR_dbg * dt
        dR_dbg_n = dRk.T @ dR_dbg - Jr * dt
        dR_n = dR @ dRk
        out = (
            jnp.where(m, dR_n, dR), jnp.where(m, dv_n, dv), jnp.where(m, dp_n, dp),
            T + jnp.where(m, dt, 0.0),
            jnp.where(m, dR_dbg_n, dR_dbg), jnp.where(m, dv_dbg_n, dv_dbg),
            jnp.where(m, dv_dba_n, dv_dba), jnp.where(m, dp_dbg_n, dp_dbg),
            jnp.where(m, dp_dba_n, dp_dba),
        )
        return out, None

    z3 = jnp.zeros((3, 3), dtype)
    init = (eye, jnp.zeros(3, dtype), jnp.zeros(3, dtype), jnp.zeros((), dtype), z3, z3, z3, z3, z3)
    (dR, dv, dp, T, dR_dbg, dv_dbg, dv_dba, dp_dbg, dp_dba), _ = jax.lax.scan(
        step, init, (imu_acc, imu_gyro, imu_dt, imu_mask)
    )
    return PreintegratedImu(dR, dv, dp, T, dR_dbg, dv_dbg, dv_dba, dp_dbg, dp_dba, bg0, ba0)


@jax.jit
def bias_corrected(pim: PreintegratedImu, bg, ba):
    """First-order bias-corrected deltas (gtsam biasCorrectedDelta)."""
    dbg = bg - pim.bg0
    dba = ba - pim.ba0
    dR = pim.dR @ so3.exp(pim.dR_dbg @ dbg)
    dv = pim.dv + pim.dv_dbg @ dbg + pim.dv_dba @ dba
    dp = pim.dp + pim.dp_dbg @ dbg + pim.dp_dba @ dba
    return dR, dv, dp


@jax.jit
def residual(pim: PreintegratedImu, Ri, pi, vi, Rj, pj, vj, bg, ba, grav):
    """9-dim IMU factor residual between states i and j (gtsam ImuFactor)."""
    dR, dv, dp = bias_corrected(pim, bg, ba)
    T = pim.dt
    er = so3.log(dR.T @ (Ri.T @ Rj))
    ev = Ri.T @ (vj - vi - grav * T) - dv
    ep = Ri.T @ (pj - pi - vi * T - 0.5 * grav * T * T) - dp
    return jnp.concatenate([er, ev, ep])


@jax.jit
def failure_detection(vel, bg, ba, vel_limit: float = 30.0, bias_limit: float = 1.0):
    """Divergence gate (imuPreintegration.cpp:440-458): large velocity or bias
    means the optimization diverged -> caller should reset."""
    return (jnp.linalg.norm(vel) > vel_limit) | (jnp.linalg.norm(bg) > bias_limit) | (
        jnp.linalg.norm(ba) > bias_limit
    )
