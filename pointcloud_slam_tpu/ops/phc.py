"""Pseudo-Hilbert-curve (PHC) point ordering and sub-voxel centroid merge.

Behavioral parity target: the reference's PHC iVox node variant —
`src/jueying_lio/include/ivox3d/ivox3d_node.hpp` (IVoxNodePhc: each voxel is
split into 2^order sub-cubes per axis, points landing in the same sub-cube are
merged into a running centroid, and storage is ordered by the sub-cube's
Hilbert index) over the curve index in
`src/jueying_lio/include/ivox3d/hilbert.hpp`.

TPU re-design: the pointer/sorted-vector node structure does not map to a
static-shape machine, but the PHC node's two observable behaviors do:

  1. **bounded in-voxel density via centroid merge** — `phc_merge` collapses
     every Hilbert sub-cube to the centroid of its points *before* map
     insertion (one sorted segment-mean pass, the same machinery as
     `downsample.voxel_downsample` but on the (voxel, sub-cube) key);
  2. **curve-ordered storage** — `phc_sort` orders a batch along the
     voxel-major / Hilbert-minor curve so the fixed per-voxel point blocks of
     `voxel_grid.insert` (slot = in-batch arrival rank) fill in Hilbert order,
     mirroring the PHC node's sorted `phc_` vector.

The curve index itself is Skilling's transpose algorithm ("Programming the
Hilbert curve", AIP Conf. Proc. 707, 2004) — pure bitwise ops, unrolled over
the static bit order, vectorized over the point axis. `order` <= 10 (3*order
index bits in uint32).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_U = jnp.uint32


def _axes_to_transpose(X, order: int):
    """Skilling AxesToTranspose for n=3, vectorized. X: list of 3 uint32 arrays."""
    X = list(X)
    # inverse undo excess work
    for qbit in range(order - 1, 0, -1):
        Q = _U(1 << qbit)
        P = _U((1 << qbit) - 1)
        for i in range(3):
            hasq = (X[i] & Q) != 0
            if i == 0:
                X[0] = jnp.where(hasq, X[0] ^ P, X[0])
            else:
                t = (X[0] ^ X[i]) & P
                X[0] = jnp.where(hasq, X[0] ^ P, X[0] ^ t)
                X[i] = jnp.where(hasq, X[i], X[i] ^ t)
    # Gray encode
    for i in range(1, 3):
        X[i] = X[i] ^ X[i - 1]
    t = jnp.zeros_like(X[0])
    for qbit in range(order - 1, 0, -1):
        Q = _U(1 << qbit)
        t = jnp.where((X[2] & Q) != 0, t ^ (Q - _U(1)), t)
    return [x ^ t for x in X]


def _transpose_to_axes(X, order: int):
    """Skilling TransposeToAxes for n=3, vectorized (inverse of the above)."""
    X = list(X)
    # Gray decode
    t = X[2] >> 1
    for i in range(2, 0, -1):
        X[i] = X[i] ^ X[i - 1]
    X[0] = X[0] ^ t
    # undo excess work
    for qbit in range(1, order):
        Q = _U(1 << qbit)
        P = _U((1 << qbit) - 1)
        for i in range(2, -1, -1):
            hasq = (X[i] & Q) != 0
            if i == 0:
                X[0] = jnp.where(hasq, X[0] ^ P, X[0])
            else:
                t = (X[0] ^ X[i]) & P
                X[0] = jnp.where(hasq, X[0] ^ P, X[0] ^ t)
                X[i] = jnp.where(hasq, X[i], X[i] ^ t)
    return X


@functools.partial(jax.jit, static_argnames=("order",))
def hilbert_index(coords: jnp.ndarray, order: int) -> jnp.ndarray:
    """3-D Hilbert curve index of integer sub-cube coords.

    coords (3, N) with entries in [0, 2^order) -> (N,) uint32 in [0, 8^order).
    Plays hilbert::PositionToIndex (hilbert.hpp:84+).
    """
    assert 1 <= order <= 10
    X = _axes_to_transpose([coords[i].astype(_U) for i in range(3)], order)
    h = jnp.zeros_like(X[0])
    for bit in range(order - 1, -1, -1):
        for i in range(3):
            h = (h << 1) | ((X[i] >> bit) & _U(1))
    return h


@functools.partial(jax.jit, static_argnames=("order",))
def hilbert_coords(h: jnp.ndarray, order: int) -> jnp.ndarray:
    """Inverse of `hilbert_index`: (N,) uint32 -> (3, N) uint32 sub-cube coords.

    Plays hilbert::IndexToPosition (hilbert.hpp)."""
    assert 1 <= order <= 10
    h = h.astype(_U)
    X = [jnp.zeros_like(h) for _ in range(3)]
    for bit in range(order - 1, -1, -1):
        for i in range(3):
            shift = 3 * bit + (2 - i)
            X[i] = (X[i] << 1) | ((h >> shift) & _U(1))
    X = _transpose_to_axes(X, order)
    return jnp.stack(X)


def _phc_key(points: jnp.ndarray, mask: jnp.ndarray, resolution: float, order: int):
    """(voxel coords, in-voxel Hilbert index) sort key per point.

    Returns (vox (3, N) int32 clamped-invalid, h (N,) uint32) where unmasked
    columns get a sentinel voxel that sorts last."""
    big = jnp.iinfo(jnp.int32).max
    vox = jnp.floor(points / resolution).astype(jnp.int32)
    sub = points / resolution - jnp.floor(points / resolution)       # [0, 1)
    cells = float(1 << order)
    sc = jnp.clip((sub * cells).astype(jnp.int32), 0, (1 << order) - 1)
    h = hilbert_index(sc, order)
    vox = jnp.where(mask[None, :], vox, big)
    return vox, h


@functools.partial(jax.jit, static_argnames=("order", "curve_output"))
def phc_merge(
    points: jnp.ndarray, mask: jnp.ndarray, resolution: float, order: int, curve_output: bool = False
):
    """Centroid-merge every Hilbert sub-cube (IVoxNodePhc::InsertPoint role).

    points (3, N), mask (N,) -> (merged (3, N), mask' (N,)). With
    curve_output=False, output column i holds the centroid of point i's
    (voxel, sub-cube) cell iff i is the cell's first masked point; other
    columns are masked out. With curve_output=True the centroids are instead
    PACKED at the front in voxel-major / Hilbert-minor curve order (the PHC
    node's sorted-storage order, and a free compaction — `voxel_grid.insert`
    assigns in-voxel slots by batch rank, so blocks fill along the curve).
    The merge bound is the PHC node's: at most one stored point per sub-cube,
    8^order per voxel.
    """
    N = points.shape[1]
    vox, h = _phc_key(points, mask, resolution, order)
    order_idx = jnp.lexsort((h, vox[2], vox[1], vox[0]))
    sv = vox[:, order_idx]
    sh = h[order_idx]
    sp = points[:, order_idx]
    valid = sv[0] < jnp.iinfo(jnp.int32).max
    is_first = (
        jnp.concatenate(
            [jnp.ones((1,), bool), jnp.any(sv[:, 1:] != sv[:, :-1], axis=0) | (sh[1:] != sh[:-1])]
        )
        & valid
    )
    seg_id = jnp.cumsum(is_first.astype(jnp.int32)) - 1
    tgt = jnp.where(valid, seg_id, N)
    seg_sum = jnp.zeros((3, N), points.dtype).at[:, tgt].add(sp, mode="drop")
    seg_cnt = jnp.zeros((N,), points.dtype).at[tgt].add(1.0, mode="drop")
    centroid = seg_sum / jnp.maximum(seg_cnt[None, :], 1.0)
    if curve_output:
        # seg ids increase along the curve, so the centroid array is already
        # the packed curve-ordered output
        n_seg = jnp.sum(is_first.astype(jnp.int32))
        out_mask = jax.lax.broadcasted_iota(jnp.int32, (N,), 0) < n_seg
        return centroid, out_mask
    first_tgt = jnp.where(is_first, order_idx, N)
    out = points.at[:, first_tgt].set(centroid[:, jnp.maximum(seg_id, 0)], mode="drop")
    out_mask = jnp.zeros((N,), bool).at[first_tgt].set(True, mode="drop")
    return out, out_mask


@functools.partial(jax.jit, static_argnames=("order",))
def phc_sort(points: jnp.ndarray, mask: jnp.ndarray, resolution: float, order: int):
    """Order a batch along the voxel-major / Hilbert-minor curve.

    Returns (points (3, N), mask (N,)) permuted so same-voxel points are
    contiguous and Hilbert-ordered — `voxel_grid.insert` assigns in-voxel
    slots by batch rank, so the fixed per-voxel block fills in curve order
    (the PHC node's sorted-storage role). Unmasked columns sort last.
    """
    vox, h = _phc_key(points, mask, resolution, order)
    order_idx = jnp.lexsort((h, vox[2], vox[1], vox[0]))
    return points[:, order_idx], mask[order_idx]
