"""24-dim navigation state on the manifold, 23-DoF error state.

Behavioral parity target (math re-derived, not translated):
  reference `src/jueying_lio/include/use-ikfom.hpp:14-19` —
  MTK_BUILD_MANIFOLD(state_ikfom, pos, rot(SO3), offset_R_L_I(SO3),
  offset_T_L_I, vel, bg, ba, grav(S2)) — and the boxplus/boxminus
  composition rules of `mtk/build_manifold.hpp`.

Error-state index layout (23):
  pos 0:3 | rot 3:6 | ext_R 6:9 | ext_t 9:12 | vel 12:15 | bg 15:18
  | ba 18:21 | grav 21:23 (S2 tangent, 2-DoF)
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ...geom import s2, so3

DOF = 23

# error-state block offsets
POS, ROT, EXT_R, EXT_T, VEL, BG, BA, GRAV = 0, 3, 6, 9, 12, 15, 18, 21


class NavState(NamedTuple):
    pos: jnp.ndarray    # (3,) world position of IMU
    rot: jnp.ndarray    # (3, 3) world <- IMU rotation
    ext_R: jnp.ndarray  # (3, 3) IMU <- lidar rotation (offset_R_L_I)
    ext_t: jnp.ndarray  # (3,) IMU <- lidar translation (offset_T_L_I)
    vel: jnp.ndarray    # (3,) world velocity
    bg: jnp.ndarray     # (3,) gyro bias
    ba: jnp.ndarray     # (3,) accel bias
    grav: jnp.ndarray   # (3,) gravity vector (S2, |grav| = 9.809)


def identity(dtype=jnp.float32, gravity: float = s2.GRAVITY) -> NavState:
    return NavState(
        pos=jnp.zeros(3, dtype),
        rot=jnp.eye(3, dtype=dtype),
        ext_R=jnp.eye(3, dtype=dtype),
        ext_t=jnp.zeros(3, dtype),
        vel=jnp.zeros(3, dtype),
        bg=jnp.zeros(3, dtype),
        ba=jnp.zeros(3, dtype),
        grav=jnp.asarray([0.0, 0.0, -gravity], dtype),
    )


def boxplus(s: NavState, dx: jnp.ndarray) -> NavState:
    """s [+] dx with the 23-dim error vector (MTK right-multiplicative SO3,
    S2 tangent retraction for gravity)."""
    return NavState(
        pos=s.pos + dx[POS:POS + 3],
        rot=s.rot @ so3.exp(dx[ROT:ROT + 3]),
        ext_R=s.ext_R @ so3.exp(dx[EXT_R:EXT_R + 3]),
        ext_t=s.ext_t + dx[EXT_T:EXT_T + 3],
        vel=s.vel + dx[VEL:VEL + 3],
        bg=s.bg + dx[BG:BG + 3],
        ba=s.ba + dx[BA:BA + 3],
        grav=s2.boxplus(s.grav, dx[GRAV:GRAV + 2]),
    )


def boxminus(a: NavState, b: NavState) -> jnp.ndarray:
    """23-dim dx with b [+] dx == a."""
    return jnp.concatenate(
        [
            a.pos - b.pos,
            so3.boxminus(a.rot, b.rot),
            so3.boxminus(a.ext_R, b.ext_R),
            a.ext_t - b.ext_t,
            a.vel - b.vel,
            a.bg - b.bg,
            a.ba - b.ba,
            s2.boxminus(a.grav, b.grav),
        ]
    )
