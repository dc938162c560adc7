"""ScanContext loop-closure descriptors as dense matrix ops.

Behavioral parity target (math re-derived, matmul-based):
  reference `src/jueying_slam/include/Scancontext.h` + `src/Scancontext.cpp`:
  - descriptor: PC_NUM_RING=20 rings x PC_NUM_SECTOR=60 sectors, max point z
    per polar bin, PC_MAX_RADIUS=80 m,
  - ring key: per-ring occupancy mean (kd-tree candidates in the reference),
  - distance: column-shift-aligned mean cosine distance between descriptors
    (`distanceBtnScanContext`), SC_DIST_THRES=0.3, NUM_EXCLUDE_RECENT=30.

TPU design: the candidate search is a dense ring-key distance matrix over the
keyframe store (tiny: KF x 20); the shift alignment evaluates ALL 60 circular
shifts of the query against every candidate with one batched einsum on the
MXU — no kd-tree, no argmin loops.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class ScanContextConfig:
    num_ring: int = 20
    num_sector: int = 60
    max_radius: float = 80.0
    dist_threshold: float = 0.3      # SC_DIST_THRES
    exclude_recent: int = 30         # NUM_EXCLUDE_RECENT
    num_candidates: int = 10         # NUM_CANDIDATES_FROM_TREE


@functools.partial(jax.jit, static_argnames=("cfg",))
def make_descriptor(cfg: ScanContextConfig, points: jnp.ndarray, mask: jnp.ndarray):
    """points (3, N) sensor frame -> (descriptor (R, S), ring_key (R,)).

    Bin value = max z in the bin (0 where empty, matching the reference's
    NO_POINT -> 0 normalization)."""
    R, S = cfg.num_ring, cfg.num_sector
    x, y, z = points[0], points[1], points[2]
    rho = jnp.sqrt(x * x + y * y)
    theta = jnp.arctan2(y, x) + jnp.pi  # [0, 2pi)
    ring = jnp.minimum((rho / cfg.max_radius * R).astype(jnp.int32), R - 1)
    sector = jnp.minimum((theta / (2 * jnp.pi) * S).astype(jnp.int32), S - 1)
    ok = mask & (rho < cfg.max_radius)
    flat = jnp.where(ok, ring * S + sector, R * S)
    desc = jnp.full((R * S,), -1.0e9, points.dtype).at[flat].max(z, mode="drop")
    desc = jnp.where(desc < -1.0e8, 0.0, desc).reshape(R, S)
    # ring key = per-ring mean of bin values (Scancontext.cpp:198-211
    # makeRingkeyFromScancontext: curr_row.mean() including empty bins)
    ring_key = jnp.mean(desc, axis=1)
    return desc, ring_key


def _shift_distance(query: jnp.ndarray, cands: jnp.ndarray):
    """Min-over-shifts cosine distance. query (R, S); cands (M, R, S).

    Returns (dist (M,), best_shift (M,)). Column-wise cosine distance
    averaged over non-empty column pairs (Scancontext.cpp distDirectSC)."""
    R, S = query.shape
    # all S circular shifts of the query: (S, R, S)
    shifts = jnp.stack([jnp.roll(query, s, axis=1) for s in range(S)], axis=0)
    qn = jnp.linalg.norm(shifts, axis=1)  # (S, S) column norms
    cn = jnp.linalg.norm(cands, axis=1)   # (M, S)
    # dots[m, s, c] = sum_r cands[m, r, c] * shifts[s, r, c]
    dots = jnp.einsum("mrc,src->msc", cands, shifts)
    denom = cn[:, None, :] * qn[None, :, :]
    valid = denom > 1e-9
    cs = jnp.where(valid, dots / jnp.where(valid, denom, 1.0), 0.0)
    ncols = jnp.maximum(jnp.sum(valid, axis=2), 1)
    sim = jnp.sum(cs, axis=2) / ncols  # (M, S)
    dist = 1.0 - sim
    best_shift = jnp.argmin(dist, axis=1)
    return jnp.min(dist, axis=1), best_shift.astype(jnp.int32)


class LoopCandidate(NamedTuple):
    index: jnp.ndarray      # best matching keyframe id, -1 if none
    distance: jnp.ndarray
    yaw: jnp.ndarray        # yaw alignment from the sector shift [rad]
    found: jnp.ndarray


@functools.partial(jax.jit, static_argnames=("cfg",))
def detect(
    cfg: ScanContextConfig,
    query_desc: jnp.ndarray,      # (R, S)
    query_key: jnp.ndarray,       # (R,)
    descs: jnp.ndarray,           # (KF, R, S) keyframe descriptor store
    keys: jnp.ndarray,            # (KF, R)
    num_keyframes: jnp.ndarray,   # () current count
) -> LoopCandidate:
    """detectLoopClosureID: ring-key candidates -> shift-aligned SC distance."""
    KF = descs.shape[0]
    idxs = jnp.arange(KF)
    eligible = (idxs < num_keyframes - cfg.exclude_recent)
    key_d2 = jnp.sum((keys - query_key[None, :]) ** 2, axis=1)
    key_d2 = jnp.where(eligible, key_d2, 3.0e38)
    _, cand_idx = jax.lax.top_k(-key_d2, cfg.num_candidates)
    cand_ok = key_d2[cand_idx] < 3.0e37
    dist, shift = _shift_distance(query_desc, descs[cand_idx])
    dist = jnp.where(cand_ok, dist, 3.0e38)
    best = jnp.argmin(dist)
    best_dist = dist[best]
    found = best_dist < cfg.dist_threshold
    yaw = shift[best].astype(query_desc.dtype) * (2.0 * jnp.pi / cfg.num_sector)
    return LoopCandidate(
        index=jnp.where(found, cand_idx[best], -1),
        distance=best_dist,
        yaw=yaw,
        found=found,
    )
