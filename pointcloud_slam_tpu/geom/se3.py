"""SE(3) operations for the registration solvers.

Pose representation throughout the framework: a pair (R: (..., 3, 3),
t: (..., 3)). The 6-dim tangent ordering is [rot(3), trans(3)] to match the
GN/LM solvers (reference `fast_gicp/.../lsq_registration_impl.hpp:97-166`
linearizes with the rotation block first).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from . import so3


class Pose(NamedTuple):
    """Rigid transform world <- local."""

    R: jnp.ndarray  # (..., 3, 3)
    t: jnp.ndarray  # (..., 3)

    def apply(self, pts: jnp.ndarray) -> jnp.ndarray:
        """Transform an SoA cloud (..., 3, N) -> (..., 3, N).

        Framework-wide layout convention: coordinate axis leading, point axis
        minor (TPU lane dim).
        """
        return self.R @ pts + self.t[..., :, None]

    def compose(self, other: "Pose") -> "Pose":
        return Pose(self.R @ other.R, jnp.einsum("...ij,...j->...i", self.R, other.t) + self.t)

    def inverse(self) -> "Pose":
        Rt = jnp.swapaxes(self.R, -1, -2)
        return Pose(Rt, -jnp.einsum("...ij,...j->...i", Rt, self.t))

    @property
    def matrix(self) -> jnp.ndarray:
        """Homogeneous (..., 4, 4)."""
        batch = self.t.shape[:-1]
        M = jnp.zeros(batch + (4, 4), dtype=self.t.dtype)
        M = M.at[..., :3, :3].set(self.R)
        M = M.at[..., :3, 3].set(self.t)
        M = M.at[..., 3, 3].set(1.0)
        return M


def identity(dtype=jnp.float32, batch=()) -> Pose:
    R = jnp.broadcast_to(jnp.eye(3, dtype=dtype), batch + (3, 3))
    t = jnp.zeros(batch + (3,), dtype=dtype)
    return Pose(R, t)


def from_matrix(M: jnp.ndarray) -> Pose:
    return Pose(M[..., :3, :3], M[..., :3, 3])


def exp(xi: jnp.ndarray) -> Pose:
    """xi = [omega(3), v(3)] -> Pose. Uses the full SE(3) exponential."""
    omega, v = xi[..., :3], xi[..., 3:]
    R = so3.exp(omega)
    V = so3.A_matrix(omega)  # left Jacobian doubles as the V matrix
    return Pose(R, jnp.einsum("...ij,...j->...i", V, v))


def log(p: Pose) -> jnp.ndarray:
    omega = so3.log(p.R)
    V = so3.A_matrix(omega)
    v = jnp.linalg.solve(V, p.t[..., None])[..., 0]
    return jnp.concatenate([omega, v], axis=-1)


def retract_left(p: Pose, xi: jnp.ndarray) -> Pose:
    """Left-multiplicative update used by the LM solver: p' = exp_approx(xi) * p.

    Matches the reference solver's `se3_exp(delta) * x0` step
    (lsq_registration_impl.hpp:131-139) but with the rotation applied exactly
    via SO(3) exp and the translation added directly (first-order in v), the
    same convention as the reference's so3_exp + translation composition.
    """
    dR = so3.exp(xi[..., :3])
    return Pose(dR @ p.R, jnp.einsum("...ij,...j->...i", dR, p.t) + xi[..., 3:])


def boxminus(a: Pose, b: Pose) -> jnp.ndarray:
    """Left-tangent difference: xi with retract_left(b, xi) ~= a (exact for R)."""
    dR = a.R @ jnp.swapaxes(b.R, -1, -2)
    omega = so3.log(dR)
    v = a.t - jnp.einsum("...ij,...j->...i", dR, b.t)
    return jnp.concatenate([omega, v], axis=-1)
