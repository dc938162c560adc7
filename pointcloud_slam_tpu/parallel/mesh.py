"""Device mesh construction and sharding helpers.

The reference has no multi-device story (ROS processes on one robot,
SURVEY.md §2.5); the TPU framework's parallel axes are:
  * `dp` — independent registration problems / frame pairs (data parallel)
  * `sp` — the point axis of one frame (sequence-parallel analogue): each
    device linearizes its point shard, H/b are combined with a psum over ICI.
Keyframe-sharded pose-graph solving reuses `dp` as the keyframe axis.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(n_devices: Optional[int] = None, axes: Sequence[str] = ("dp", "sp"), dp: Optional[int] = None) -> Mesh:
    """Build a (dp, sp) mesh over the first n devices.

    dp defaults to the largest power-of-two divisor <= sqrt(n) so both axes
    are populated when possible.
    """
    devices = jax.devices() if n_devices is None else jax.devices()[:n_devices]
    n = len(devices)
    if dp is None:
        dp = 1
        while dp * 2 <= int(np.sqrt(n)) and n % (dp * 2) == 0:
            dp *= 2
        if n % dp != 0:
            dp = 1
    sp = n // dp
    arr = np.asarray(devices).reshape(dp, sp)
    return Mesh(arr, axes)
