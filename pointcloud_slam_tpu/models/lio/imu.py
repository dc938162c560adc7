"""IMU initialization, forward propagation, and per-point motion compensation.

Behavioral parity target (math re-derived, vectorized):
  reference `src/jueying_lio/include/imu_processing.hpp`
  - `IMUInit` (:113-163): gravity/bias from the first ~20 measurements,
  - `UndistortPcl` (:165-285): forward ESKF propagation per IMU sample
    building a pose table, then per-point backward compensation
    p' = extR^T (rot_end^T (R_i (extR p + extT) + T_ei) - extT)
    with R_i = R_head Exp(gyro_tail dt), T_ei = pos_head + vel_head dt
    + 0.5 acc_tail dt^2 - pos_end.

TPU design: the pose table is built with a lax.scan of tiny predicts; the
backward pass is fully vectorized over points with component-array Rodrigues
(keeps the (N,) point axis on the vector lanes, no (N, 3, 3) intermediates).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ...geom import s2
from . import eskf
from . import state as st


class PoseTable(NamedTuple):
    """Per-IMU-sample states for backward compensation. M+1 entries
    (entry 0 = frame-start state, IMUpose_ in the reference)."""

    offs: jnp.ndarray   # (M+1,) time offset from scan start [s]
    R: jnp.ndarray      # (M+1, 9) row-major world<-IMU rotation
    pos: jnp.ndarray    # (M+1, 3)
    vel: jnp.ndarray    # (M+1, 3)
    acc: jnp.ndarray    # (M+1, 3) world-frame acceleration incl. gravity
    gyro: jnp.ndarray   # (M+1, 3) unbiased body angular rate


def propagate(x, P, Q, imu_acc, imu_gyro, imu_dt, imu_offs, imu_mask, acc_scale, prev_acc_w, prev_gyro):
    """Forward-propagate through the frame's IMU samples (masked), collecting
    the pose table. imu_* are (M, 3)/(M,). Returns (x_end, P_end, table)."""
    dtype = P.dtype

    def step(carry, inp):
        x, P = carry
        acc, gyro, dt, mask = inp
        acc = acc * acc_scale
        x_new, P_new = eskf.predict(x, P, acc, gyro, dt, Q)
        x = jax.tree.map(lambda a, b: jnp.where(mask, b, a), x, x_new)
        P = jnp.where(mask, P_new, P)
        acc_w = x.rot @ (acc - x.ba) + x.grav
        gyro_u = gyro - x.bg
        return (x, P), (x.rot.reshape(9), x.pos, x.vel, acc_w, gyro_u)

    (x_end, P_end), (Rs, poss, vels, accs, gyros) = jax.lax.scan(
        step, (x, P), (imu_acc, imu_gyro, imu_dt, imu_mask)
    )
    # entry 0 sits at scan start (offset 0); padded/masked samples must carry a
    # LARGE imu_offs from the host feed so searchsorted never selects them
    table = PoseTable(
        offs=jnp.concatenate([jnp.zeros((1,), dtype), imu_offs]),
        R=jnp.concatenate([x.rot.reshape(1, 9), Rs]),
        pos=jnp.concatenate([x.pos[None], poss]),
        vel=jnp.concatenate([x.vel[None], vels]),
        acc=jnp.concatenate([prev_acc_w[None], accs]),
        gyro=jnp.concatenate([prev_gyro[None], gyros]),
    )
    return x_end, P_end, table


def _rodrigues_apply(wx, wy, wz, px, py, pz):
    """(Exp([wx,wy,wz]) @ p) with component arrays (N,) — no (N,3,3) tensors."""
    t2 = wx * wx + wy * wy + wz * wz
    t = jnp.sqrt(jnp.maximum(t2, 1e-16))
    small = t2 < 1e-8
    a = jnp.where(small, 1.0 - t2 / 6.0, jnp.sin(t) / t)
    b = jnp.where(small, 0.5 - t2 / 24.0, (1.0 - jnp.cos(t)) / t2)
    # p' = p + a (w x p) + b (w x (w x p))
    c1x = wy * pz - wz * py
    c1y = wz * px - wx * pz
    c1z = wx * py - wy * px
    c2x = wy * c1z - wz * c1y
    c2y = wz * c1x - wx * c1z
    c2z = wx * c1y - wy * c1x
    return px + a * c1x + b * c2x, py + a * c1y + b * c2y, pz + a * c1z + b * c2z


def undistort(points, t_offs, mask, table: PoseTable, x_end: st.NavState):
    """Motion-compensate every point to the scan-end pose. points (3, N) in
    the LIDAR frame, t_offs (N,) seconds from scan start (any order).

    Returns compensated points (3, N) in the lidar frame at scan end."""
    M1 = table.offs.shape[0]
    # branchless interval search (the pose table is ~20 entries: a (M+1, N)
    # broadcast-compare beats a gathering searchsorted on the VPU) and ONE
    # packed column gather per table side — head rows [R9|pos3|vel3] at idx,
    # tail rows [acc3|gyro3] at idx+1 — instead of ~21 scalar-row gathers
    idx = jnp.clip(jnp.sum((t_offs[None, :] >= table.offs[:, None]).astype(jnp.int32), axis=0) - 1, 0, M1 - 1)
    tail = jnp.minimum(idx + 1, M1 - 1)
    head_tbl = jnp.concatenate([table.R.T, table.pos.T, table.vel.T, table.offs[None, :]], axis=0)  # (16, M+1)
    tail_tbl = jnp.concatenate([table.acc.T, table.gyro.T], axis=0)            # (6, M+1)
    hg = head_tbl[:, idx]   # (16, N)
    tg = tail_tbl[:, tail]  # (6, N)
    dt = t_offs - hg[15]

    # lidar -> IMU frame
    eR, et = x_end.ext_R, x_end.ext_t
    px = eR[0, 0] * points[0] + eR[0, 1] * points[1] + eR[0, 2] * points[2] + et[0]
    py = eR[1, 0] * points[0] + eR[1, 1] * points[1] + eR[1, 2] * points[2] + et[1]
    pz = eR[2, 0] * points[0] + eR[2, 1] * points[1] + eR[2, 2] * points[2] + et[2]

    # R_i = R_head Exp(gyro_tail dt): apply Exp first, then R_head (both gathered)
    gx = tg[3] * dt
    gy = tg[4] * dt
    gz = tg[5] * dt
    px, py, pz = _rodrigues_apply(gx, gy, gz, px, py, pz)
    qx = hg[0] * px + hg[1] * py + hg[2] * pz
    qy = hg[3] * px + hg[4] * py + hg[5] * pz
    qz = hg[6] * px + hg[7] * py + hg[8] * pz

    # + T_ei (world), relative to scan-end position
    qx = qx + hg[9] + hg[12] * dt + 0.5 * tg[0] * dt * dt - x_end.pos[0]
    qy = qy + hg[10] + hg[13] * dt + 0.5 * tg[1] * dt * dt - x_end.pos[1]
    qz = qz + hg[11] + hg[14] * dt + 0.5 * tg[2] * dt * dt - x_end.pos[2]

    # world -> scan-end IMU -> lidar frame
    Re = x_end.rot
    ux = Re[0, 0] * qx + Re[1, 0] * qy + Re[2, 0] * qz
    uy = Re[0, 1] * qx + Re[1, 1] * qy + Re[2, 1] * qz
    uz = Re[0, 2] * qx + Re[1, 2] * qy + Re[2, 2] * qz
    vx = ux - et[0]
    vy = uy - et[1]
    vz = uz - et[2]
    ox = eR[0, 0] * vx + eR[1, 0] * vy + eR[2, 0] * vz
    oy = eR[0, 1] * vx + eR[1, 1] * vy + eR[2, 1] * vz
    oz = eR[0, 2] * vx + eR[1, 2] * vy + eR[2, 2] * vz
    out = jnp.stack([ox, oy, oz], axis=0)
    return jnp.where(mask[None, :], out, points)


def init_from_measurements(mean_acc, mean_gyro, gravity: float = s2.GRAVITY):
    """Gravity / gyro-bias / accel-scale from averaged static measurements
    (imu_processing.hpp:113-163)."""
    norm = jnp.linalg.norm(mean_acc)
    grav = -mean_acc / jnp.maximum(norm, 1e-6) * gravity
    acc_scale = gravity / jnp.maximum(norm, 1e-6)
    return grav, mean_gyro, acc_scale
