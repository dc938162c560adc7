"""SO(3) operations, batched and jittable.

Behavioral parity targets (math only, re-derived):
  - reference `src/jueying_lio/include/IKFoM_toolkit/mtk/src/mtkmath.hpp`
    (`MTK::exp`, `MTK::A_matrix`, `MTK::hat`)
  - reference `src/jueying_lio/include/IKFoM_toolkit/mtk/types/SOn.hpp`
    (right-multiplicative boxplus: q' = q * exp(delta))

All functions accept arbitrary leading batch dimensions on their arguments
(the trailing dims must be (3,) for tangent vectors and (3, 3) for rotation
matrices) and are safe to `jax.jit` / `jax.vmap`.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-8


def hat(w: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric matrix of w: hat(w) @ v == cross(w, v). (..., 3) -> (..., 3, 3)."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([z, -wz, wy], axis=-1),
            jnp.stack([wz, z, -wx], axis=-1),
            jnp.stack([-wy, wx, z], axis=-1),
        ],
        axis=-2,
    )


def vee(W: jnp.ndarray) -> jnp.ndarray:
    """Inverse of hat. (..., 3, 3) -> (..., 3)."""
    return jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], axis=-1)


def _sinc_coeffs(theta2: jnp.ndarray):
    """(sin t / t, (1 - cos t) / t^2) with small-angle Taylor fallback.

    theta2 is the squared angle; using it avoids a sqrt of values near zero in
    the derivative path.
    """
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS * _EPS))
    small = theta2 < _EPS
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    return a, b


def exp(w: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues' exponential map. (..., 3) -> (..., 3, 3)."""
    theta2 = jnp.sum(w * w, axis=-1)
    a, b = _sinc_coeffs(theta2)
    W = hat(w)
    WW = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + a[..., None, None] * W + b[..., None, None] * WW


def log(R: jnp.ndarray) -> jnp.ndarray:
    """Logarithm map (rotation matrix -> axis-angle). (..., 3, 3) -> (..., 3).

    Valid for angles in [0, pi); near pi uses the symmetric-part fallback.
    """
    tr = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_theta = jnp.clip((tr - 1.0) * 0.5, -1.0, 1.0)
    # Antisymmetric part gives axis*sin(theta); its norm is a far more accurate
    # sin(theta) near pi than arccos of the trace.
    axis_sin = 0.5 * vee(R - jnp.swapaxes(R, -1, -2))
    # derivative-safe norm: ||x|| has a NaN gradient at x = 0 (the identity
    # rotation) which poisons jacfwd-linearized factors; the epsilon shifts
    # the value by < 1e-15 and keeps the tangent finite
    sin_theta = jnp.sqrt(jnp.sum(axis_sin * axis_sin, axis=-1) + 1e-30)
    theta = jnp.arctan2(sin_theta, cos_theta)
    small = theta < 1e-5
    near_pi = theta > 3.0
    # generic: w = theta / sin(theta) * axis_sin
    scale = jnp.where(small, 1.0 + theta * theta / 6.0, theta / jnp.where(sin_theta == 0, 1.0, sin_theta))
    w_generic = scale[..., None] * axis_sin
    # near pi: R ~ I + 2*hat(u)^2 with |w| = theta; u from diagonal
    B = (R + jnp.swapaxes(R, -1, -2)) * 0.5  # symmetric part
    diag = jnp.stack([B[..., 0, 0], B[..., 1, 1], B[..., 2, 2]], axis=-1)
    u2 = jnp.clip((diag - cos_theta[..., None]) / jnp.where(jnp.abs(1.0 - cos_theta) < _EPS, 1.0, (1.0 - cos_theta))[..., None], 0.0, 1.0)
    u = jnp.sqrt(u2)
    # fix signs from the antisymmetric part (or off-diagonals when it vanishes)
    sgn = jnp.where(axis_sin >= 0, 1.0, -1.0)
    # when axis_sin ~ 0 (theta ~ pi), use off-diagonal signs relative to largest component
    off = jnp.stack(
        [
            jnp.ones_like(u[..., 0]),
            jnp.where(B[..., 0, 1] >= 0, 1.0, -1.0),
            jnp.where(B[..., 0, 2] >= 0, 1.0, -1.0),
        ],
        axis=-1,
    )
    use_off = jnp.abs(axis_sin).max(axis=-1, keepdims=True) < 1e-6
    sgn = jnp.where(use_off, off, sgn)
    w_pi = theta[..., None] * u * sgn
    return jnp.where(near_pi[..., None], w_pi, w_generic)


def A_matrix(w: jnp.ndarray) -> jnp.ndarray:
    """Left Jacobian of the exponential map (MTK's `A_matrix`).

    A(w) = I + (1-cos t)/t^2 * hat(w) + (t - sin t)/t^3 * hat(w)^2
    """
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS * _EPS))
    small = theta2 < _EPS
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    c = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0, (theta - jnp.sin(theta)) / (theta2 * theta))
    W = hat(w)
    WW = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + b[..., None, None] * W + c[..., None, None] * WW


def boxplus(R: jnp.ndarray, delta: jnp.ndarray) -> jnp.ndarray:
    """Right-multiplicative retraction: R' = R @ exp(delta) (MTK SO3 boxplus)."""
    return R @ exp(delta)


def boxminus(Ra: jnp.ndarray, Rb: jnp.ndarray) -> jnp.ndarray:
    """delta with Rb @ exp(delta) == Ra."""
    return log(jnp.swapaxes(Rb, -1, -2) @ Ra)


def normalize(R: jnp.ndarray) -> jnp.ndarray:
    """Re-orthonormalize a near-rotation matrix (one Newton/Gram step via SVD-free path).

    Uses the iterative polar update R <- 1.5 R - 0.5 R R^T R which converges
    quadratically for matrices near SO(3); two steps are plenty for drift from
    float32 chained products.
    """
    for _ in range(2):
        R = 1.5 * R - 0.5 * R @ jnp.swapaxes(R, -1, -2) @ R
    return R


def from_quat(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion (x, y, z, w) -> rotation matrix."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    n = x * x + y * y + z * z + w * w
    s = jnp.where(n > 0, 2.0 / jnp.where(n == 0, 1.0, n), 0.0)
    xx, yy, zz = x * x * s, y * y * s, z * z * s
    xy, xz, yz = x * y * s, x * z * s, y * z * s
    wx, wy, wz = w * x * s, w * y * s, w * z * s
    return jnp.stack(
        [
            jnp.stack([1.0 - (yy + zz), xy - wz, xz + wy], axis=-1),
            jnp.stack([xy + wz, 1.0 - (xx + zz), yz - wx], axis=-1),
            jnp.stack([xz - wy, yz + wx, 1.0 - (xx + yy)], axis=-1),
        ],
        axis=-2,
    )


def to_quat(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> quaternion (x, y, z, w), w >= 0. Shepperd's method, branch-free."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22
    # four candidate constructions; pick the numerically best
    qw = jnp.stack([1.0 + tr, 1.0 + m00 - m11 - m22, 1.0 - m00 + m11 - m22, 1.0 - m00 - m11 + m22], axis=-1)
    qw = jnp.sqrt(jnp.maximum(qw, 0.0)) * 0.5
    best = jnp.argmax(qw, axis=-1)

    def safe(x):
        return jnp.where(jnp.abs(x) < _EPS, _EPS, x)

    w0 = qw[..., 0]
    c0 = jnp.stack([(m21 - m12) / safe(4 * w0), (m02 - m20) / safe(4 * w0), (m10 - m01) / safe(4 * w0), w0], axis=-1)
    x1 = qw[..., 1]
    c1 = jnp.stack([x1, (m01 + m10) / safe(4 * x1), (m02 + m20) / safe(4 * x1), (m21 - m12) / safe(4 * x1)], axis=-1)
    y2 = qw[..., 2]
    c2 = jnp.stack([(m01 + m10) / safe(4 * y2), y2, (m12 + m21) / safe(4 * y2), (m02 - m20) / safe(4 * y2)], axis=-1)
    z3 = qw[..., 3]
    c3 = jnp.stack([(m02 + m20) / safe(4 * z3), (m12 + m21) / safe(4 * z3), z3, (m10 - m01) / safe(4 * z3)], axis=-1)
    b = best[..., None]
    q = jnp.where(b == 0, c0, jnp.where(b == 1, c1, jnp.where(b == 2, c2, c3)))
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    return jnp.where(q[..., 3:4] < 0, -q, q)


def from_euler(rpy: jnp.ndarray) -> jnp.ndarray:
    """ZYX (yaw-pitch-roll) euler angles (roll, pitch, yaw) -> rotation matrix."""
    r, p, y = rpy[..., 0], rpy[..., 1], rpy[..., 2]
    cr, sr = jnp.cos(r), jnp.sin(r)
    cp, sp = jnp.cos(p), jnp.sin(p)
    cy, sy = jnp.cos(y), jnp.sin(y)
    return jnp.stack(
        [
            jnp.stack([cy * cp, cy * sp * sr - sy * cr, cy * sp * cr + sy * sr], axis=-1),
            jnp.stack([sy * cp, sy * sp * sr + cy * cr, sy * sp * cr - cy * sr], axis=-1),
            jnp.stack([-sp, cp * sr, cp * cr], axis=-1),
        ],
        axis=-2,
    )


def to_euler(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> (roll, pitch, yaw), ZYX convention."""
    pitch = -jnp.arcsin(jnp.clip(R[..., 2, 0], -1.0, 1.0))
    roll = jnp.arctan2(R[..., 2, 1], R[..., 2, 2])
    yaw = jnp.arctan2(R[..., 1, 0], R[..., 0, 0])
    return jnp.stack([roll, pitch, yaw], axis=-1)
