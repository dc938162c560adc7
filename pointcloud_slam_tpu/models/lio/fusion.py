"""High-rate pose output: IMU-rate forward prediction between LIO updates.

Behavioral parity target: reference `src/jueying_slam/src/imuPreintegration.cpp`
- `TransformFusion::imuOdometryHandler` (:23-150): fuse the latest (low-rate)
  lidar odometry with IMU-rate incremental odometry for a high-rate pose
  stream, and
- `IMUPreintegration::imuHandler` (:460+): predict forward from the last
  optimized state per IMU sample (the odomTopic_incremental feedback consumed
  by the deskew stage).

One jitted scan produces the whole high-rate pose block for a frame interval.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...geom import so3
from . import state as st


@jax.jit
def predict_poses(x: st.NavState, imu_acc, imu_gyro, imu_dt, imu_mask, acc_scale=1.0):
    """Forward-predict IMU-rate poses from the last filter state (no covariance).

    imu_* are (M, 3)/(M,). Returns (R (M, 3, 3), pos (M, 3), vel (M, 3)) —
    the odomTopic_incremental stream.
    """

    def step(carry, inp):
        rot, pos, vel = carry
        acc, gyro, dt, mask = inp
        omega = gyro - x.bg
        a_w = rot @ (acc * acc_scale - x.ba) + x.grav
        pos_n = pos + vel * dt
        vel_n = vel + a_w * dt
        rot_n = rot @ so3.exp(omega * dt)
        rot = jnp.where(mask, rot_n, rot)
        pos = jnp.where(mask, pos_n, pos)
        vel = jnp.where(mask, vel_n, vel)
        return (rot, pos, vel), (rot, pos, vel)

    (_, _, _), (Rs, ps, vs) = jax.lax.scan(
        step, (x.rot, x.pos, x.vel), (imu_acc, imu_gyro, imu_dt, imu_mask)
    )
    return Rs, ps, vs


@jax.jit
def fuse_with_update(R_hi, p_hi, R_old_anchor, p_old_anchor, R_new_anchor, p_new_anchor):
    """Rebase a high-rate pose block onto a freshly optimized anchor pose
    (TransformFusion: lidar-odom pose x incremental-odom delta).

    For each high-rate pose T_hi recorded relative to the OLD anchor, output
    T_new_anchor * T_old_anchor^-1 * T_hi.
    """
    dR = R_new_anchor @ jnp.swapaxes(R_old_anchor, -1, -2)
    dp = p_new_anchor - jnp.einsum("ij,...j->...i", dR, p_old_anchor)
    R_out = jnp.einsum("ij,mjk->mik", dR, R_hi)
    p_out = jnp.einsum("ij,mj->mi", dR, p_hi) + dp
    return R_out, p_out
