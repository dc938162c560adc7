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
