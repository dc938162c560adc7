"""Pallas TPU kernel: tiled brute-force nearest-neighbor search.

Counterpart of the reference's GPU kernel
`fast_gicp/src/fast_gicp/cuda/brute_force_knn.cu` (thrust-based device KNN
used for GICP covariances and correspondences on small clouds).

Design: d2(q, p) = |q|^2 + |p|^2 - 2 q.p — the cross term is a (Bq, 3) x
(3, Bm) matmul on the MXU; the running minimum over database tiles lives in
VMEM scratch carried across the grid's inner dimension. Lanes hold the
database tile axis, sublanes the query tile axis.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INF = 3.0e38


def _nn_kernel(q_ref, db_ref, dbn_ref, best_d_ref, best_i_ref, *, bm: int):
    """Grid: (num_q_tiles, num_db_tiles); inner dim iterates db tiles."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        best_d_ref[:] = jnp.full_like(best_d_ref, _INF)
        best_i_ref[:] = jnp.full_like(best_i_ref, -1)

    q = q_ref[:]          # (Bq, 3) query tile
    db = db_ref[:]        # (3, Bm) database tile
    dbn = dbn_ref[:]      # (1, Bm) |p|^2
    cross = jnp.dot(q, db, preferred_element_type=jnp.float32)  # (Bq, Bm) MXU
    qn = jnp.sum(q * q, axis=1, keepdims=True)                  # (Bq, 1)
    d2 = qn + dbn - 2.0 * cross
    tile_min = jnp.min(d2, axis=1, keepdims=True)               # (Bq, 1)
    col = jnp.argmin(d2, axis=1).reshape(-1, 1).astype(jnp.int32) + j * bm
    better = tile_min < best_d_ref[:]
    best_i_ref[:] = jnp.where(better, col, best_i_ref[:])
    best_d_ref[:] = jnp.where(better, tile_min, best_d_ref[:])


def _knn_kernel(q_ref, db_ref, dbn_ref, best_d_ref, best_i_ref, *, bm: int, k: int):
    """Exact k-NN tile step. Grid: (num_q_tiles, num_db_tiles); the inner
    dimension iterates database tiles, carrying the running sorted top-k in
    the VMEM output blocks.

    Index packing: bm is a power of two, so the low log2(bm) mantissa bits of
    each non-negative f32 distance are replaced by the column id. Positive
    IEEE floats order like their int32 bit patterns, so ONE integer row-min
    per rank yields both the distance and its column, and masking the winner
    (exact bit-pattern match, unique by construction) costs one select. The
    truncated mantissa under-states d2 by <= 2^-14 relative (bm=512) — only
    neighbor ORDER at that resolution is affected, never identity.
    """
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        best_d_ref[:] = jnp.full_like(best_d_ref, _INF)
        best_i_ref[:] = jnp.full_like(best_i_ref, -1)

    q = q_ref[:]          # (Bq, 3) query tile
    db = db_ref[:]        # (3, Bm) database tile
    cross = jnp.dot(q, db, preferred_element_type=jnp.float32)  # (Bq, Bm) MXU
    qn = jnp.sum(q * q, axis=1, keepdims=True)
    d2 = jnp.maximum(qn + dbn_ref[:] - 2.0 * cross, 0.0)
    col = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)
    lowmask = jnp.int32(bm - 1)
    packed = (jax.lax.bitcast_convert_type(d2, jnp.int32) & ~lowmask) | col
    inf_bits = jnp.int32(0x7F800000)

    b_d, b_i = best_d_ref[:], best_i_ref[:]
    bd = [b_d[:, s] for s in range(k)]   # running sorted registers as column
    bi = [b_i[:, s] for s in range(k)]   # lists (Mosaic has no value scatter)
    for _ in range(k):
        m = jnp.min(packed, axis=1, keepdims=True)            # (Bq, 1) int
        packed = jnp.where(packed == m, inf_bits, packed)     # unique winner
        cd = jax.lax.bitcast_convert_type(m & ~lowmask, jnp.float32)[:, 0]
        ci = (m & lowmask)[:, 0] + j * bm
        # insertion sort of (cd, ci) into the k sorted register columns;
        # tile minima arrive ascending, so the merged list stays sorted
        for s in range(k):
            better = cd < bd[s]
            od, oi = bd[s], bi[s]
            bd[s] = jnp.where(better, cd, od)
            bi[s] = jnp.where(better, ci, oi)
            cd = jnp.where(better, od, cd)
            ci = jnp.where(better, oi, ci)
    best_d_ref[:] = jnp.stack(bd, axis=1)
    best_i_ref[:] = jnp.stack(bi, axis=1)


@functools.partial(jax.jit, static_argnames=("k", "bq", "bm"))
def knn(queries: jnp.ndarray, database: jnp.ndarray, k: int = 8, bq: int = 256, bm: int = 512):
    """Exact brute-force k-NN: queries (3, N), database (3, M) ->
    (d2 (k, N) ascending, idx (k, N)).

    Counterpart of the reference's GPU covariance k-NN
    (`fast_gicp/src/fast_gicp/cuda/brute_force_knn.cu`, consumed by
    `covariance_estimation.cu`). N must be a multiple of bq and M of bm —
    pad with far-away points (see `pad_cloud`)."""
    N, M = queries.shape[1], database.shape[1]
    assert N % bq == 0 and M % bm == 0, (N, M, bq, bm)
    assert bm & (bm - 1) == 0, "bm must be a power of two (index packing)"
    qT = queries.T
    dbn = jnp.sum(database * database, axis=0, keepdims=True)

    grid = (N // bq, M // bm)
    interpret = jax.devices()[0].platform == "cpu"  # CPU tests run interpreted
    best_d, best_i = pl.pallas_call(
        functools.partial(_knn_kernel, bm=bm, k=k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bq, 3), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, bm), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bm), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bq, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bq, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, k), jnp.float32),
            jax.ShapeDtypeStruct((N, k), jnp.int32),
        ],
        interpret=interpret,
    )(qT, database, dbn)
    return best_d.T, best_i.T


def pad_cloud(points: jnp.ndarray, mask: jnp.ndarray, multiple: int):
    """Pad (3, N) to a multiple of `multiple` columns; masked/padded points are
    moved far outside any scene so they are never selected as neighbors."""
    N = points.shape[1]
    Np = -(-N // multiple) * multiple
    far = jnp.asarray(1.0e17, points.dtype)
    pts = jnp.where(mask[None, :], points, far)
    if Np != N:
        pts = jnp.concatenate([pts, jnp.full((3, Np - N), far, points.dtype)], axis=1)
    return pts


@functools.partial(jax.jit, static_argnames=("bq", "bm"))
def nearest_neighbor(queries: jnp.ndarray, database: jnp.ndarray, bq: int = 256, bm: int = 512):
    """Exact 1-NN: queries (3, N), database (3, M) -> (d2 (N,), idx (N,)).

    N must be a multiple of bq and M of bm (pad with +inf-distance points —
    e.g. coordinates far outside the scene — on the host)."""
    N = queries.shape[1]
    M = database.shape[1]
    assert N % bq == 0 and M % bm == 0, (N, M, bq, bm)
    qT = queries.T  # (N, 3): queries on sublanes
    dbn = jnp.sum(database * database, axis=0, keepdims=True)  # (1, M)

    grid = (N // bq, M // bm)
    interpret = jax.devices()[0].platform == "cpu"  # CPU tests run interpreted
    best_d, best_i = pl.pallas_call(
        functools.partial(_nn_kernel, bm=bm),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bq, 3), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, bm), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bm), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bq, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bq, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, 1), jnp.float32),
            jax.ShapeDtypeStruct((N, 1), jnp.int32),
        ],
        interpret=interpret,
    )(qT, database, dbn)
    return jnp.maximum(best_d[:, 0], 0.0), best_i[:, 0]
