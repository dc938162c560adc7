"""S2 sphere manifold (gravity direction with fixed magnitude), 2-DoF tangent.

Behavioral parity target (math re-derived, not translated):
  reference `src/jueying_lio/include/IKFoM_toolkit/mtk/types/S2.hpp`
  with template parameters `S2<double, 98090, 10000, 1>` — i.e. sphere radius
  (gravity magnitude) 9.809 and the S2_typ == 1 tangent-basis construction
  (x-axis singularity chart).

The element is stored as the raw 3-vector `vec` with |vec| == length; all ops
preserve the norm. Functions are batched over leading dims and jittable.
"""

from __future__ import annotations

import jax.numpy as jnp

from . import so3

GRAVITY = 9.809  # 98090 / 10000, reference use-ikfom.hpp:10
_TOL = 1e-11


def bx(vec: jnp.ndarray) -> jnp.ndarray:
    """Tangent basis (3, 2), orthonormal, orthogonal to vec. S2_typ == 1 chart.

    Columns span the tangent plane at vec/|vec|; parity with S2_Bx
    (S2.hpp:166-200, typ-1 branch).
    """
    length = jnp.linalg.norm(vec, axis=-1)
    v0, v1, v2 = vec[..., 0], vec[..., 1], vec[..., 2]
    denom = length + v0
    safe_denom = jnp.where(jnp.abs(denom) < _TOL, 1.0, denom)
    b_main = jnp.stack(
        [
            jnp.stack([-v1, -v2], axis=-1),
            jnp.stack([length - v1 * v1 / safe_denom, -v2 * v1 / safe_denom], axis=-1),
            jnp.stack([-v2 * v1 / safe_denom, length - v2 * v2 / safe_denom], axis=-1),
        ],
        axis=-2,
    ) / jnp.where(length[..., None, None] < _TOL, 1.0, length[..., None, None])
    # singular chart (vec ~ -length * e_x): fixed basis
    b_sing = jnp.zeros_like(b_main)
    b_sing = b_sing.at[..., 1, 1].set(-1.0)
    b_sing = b_sing.at[..., 2, 0].set(1.0)
    singular = (denom <= _TOL)[..., None, None]
    return jnp.where(singular, b_sing, b_main)


def boxplus(vec: jnp.ndarray, delta: jnp.ndarray) -> jnp.ndarray:
    """vec' = Exp(Bx(vec) @ delta) @ vec. delta is (..., 2)."""
    Bu = jnp.einsum("...ij,...j->...i", bx(vec), delta)
    return jnp.einsum("...ij,...j->...i", so3.exp(Bu), vec)


def boxminus(vec: jnp.ndarray, other: jnp.ndarray) -> jnp.ndarray:
    """2-dim tangent delta at `other` with other [+] delta == vec (S2.hpp:140-158)."""
    cross = jnp.cross(vec, other)
    v_sin = jnp.linalg.norm(cross, axis=-1)
    v_cos = jnp.sum(vec * other, axis=-1)
    theta = jnp.arctan2(v_sin, v_cos)
    Bx_o = bx(other)
    hat_o_v = jnp.cross(other, vec)
    safe_sin = jnp.where(v_sin < _TOL, 1.0, v_sin)
    res_main = (theta / safe_sin)[..., None] * jnp.einsum("...ji,...j->...i", Bx_o, hat_o_v)
    # degenerate: parallel (0) or antiparallel (pi, ill-defined direction)
    res_anti = jnp.zeros_like(res_main).at[..., 0].set(jnp.pi)
    res_zero = jnp.zeros_like(res_main)
    degen = (v_sin < _TOL)[..., None]
    anti = (jnp.abs(theta) > _TOL)[..., None]
    return jnp.where(degen, jnp.where(anti, res_anti, res_zero), res_main)


def nx_yy(vec: jnp.ndarray) -> jnp.ndarray:
    """N(x, x) projection Jacobian, (2, 3): (1/len^2) Bx^T hat(vec) (S2.hpp:225-229)."""
    length2 = jnp.sum(vec * vec, axis=-1)
    Bx = bx(vec)
    BtH = jnp.einsum("...ji,...jk->...ik", Bx, so3.hat(vec))
    return BtH / jnp.where(length2 < _TOL, 1.0, length2)[..., None, None]


def mx(vec: jnp.ndarray, delta: jnp.ndarray) -> jnp.ndarray:
    """M(x, delta) retraction Jacobian, (3, 2) (S2.hpp:231-242).

    delta ~ 0:  -hat(vec) @ Bx
    else:       -Exp(Bu) @ hat(vec) @ A(Bu)^T @ Bx,  Bu = Bx @ delta
    """
    Bx = bx(vec)
    Bu = jnp.einsum("...ij,...j->...i", Bx, delta)
    small = (jnp.sum(delta * delta, axis=-1) < _TOL * _TOL)[..., None, None]
    m_small = -so3.hat(vec) @ Bx
    m_big = -so3.exp(Bu) @ so3.hat(vec) @ jnp.swapaxes(so3.A_matrix(Bu), -1, -2) @ Bx
    return jnp.where(small, m_small, m_big)


def normalize(vec: jnp.ndarray, length: float = GRAVITY) -> jnp.ndarray:
    """Project a raw 3-vector onto the sphere of radius `length`."""
    n = jnp.linalg.norm(vec, axis=-1, keepdims=True)
    return vec / jnp.where(n < _TOL, 1.0, n) * length
