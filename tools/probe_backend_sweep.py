#!/usr/bin/env python
"""Break down the cost of ONE deferred-solve GN sweep at 5k keyframes.

The round-4 drain stall is 80 ms/frame (backend_5k_single_sweep_ms): one
relinearize + chain_factor + pcg_iterations of (Hv + chain_solve). Before
slicing anything across frames (VERDICT r5 task 5) this probe measures where
the 80 ms actually goes:
  terms_ms    — _graph_terms (all-family relinearization, incl. vmapped
                jacfwd IMU factors)
  factor_ms   — chain_factor (block cyclic reduction, log2(KF) levels)
  pcg_iter_ms — ONE Hv + chain_solve application
  sweep(k)_ms — full optimize(gn_iterations=1) at pcg_iterations=k
Run on the real chip: python tools/probe_backend_sweep.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np
import jax
import jax.numpy as jnp

import bench
from pointcloud_slam_tpu.models.liosam import backend as bk


def timed(fn, *args, reps=5):
    out = fn(*args)
    _ = jax.tree.map(np.asarray, out)  # compile + readback
    t0 = time.perf_counter()
    for _ in range(reps):
        _ = jax.tree.map(np.asarray, fn(*args))
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    KF, L = 5120, 256
    cfg, g, g_imu, t_true = bench.build_backend_graph(KF, L)

    terms = jax.jit(lambda g: jax.tree.map(jnp.sum, bk._graph_terms(cfg, g)[:6]))
    print(f"terms_ms           {timed(terms, g_imu):8.2f}")

    @jax.jit
    def blocks_and_B(g):
        fi, fj, Ji, Jj, e, info, B = bk._graph_terms(cfg, g)
        prior = jnp.ones((KF, bk.D), jnp.float32)
        Dblk = bk._precond_blocks(KF, jnp.float32, fi, fj, Ji, Jj, info, prior)
        return Dblk, B

    Dblk, B = blocks_and_B(g_imu)
    print(f"terms+blocks_ms    {timed(blocks_and_B, g_imu):8.2f}")

    @jax.jit
    def factor(Dblk, B):
        levels, top = bk.chain_factor(Dblk, B)
        return levels[0]["A"][0, 0, 0], top[0, 0]

    print(f"chain_factor_ms    {timed(factor, Dblk, B):8.2f}")

    @jax.jit
    def solve_once(Dblk, B, r):
        levels, top = bk.chain_factor(Dblk, B)
        return bk.chain_solve(levels, top, r)

    r = jnp.ones((KF, bk.D), jnp.float32)
    t_factor_solve = timed(solve_once, Dblk, B, r)
    print(f"factor+1solve_ms   {t_factor_solve:8.2f}")

    @jax.jit
    def hv_only(g, v):
        fi, fj, Ji, Jj, e, info, _ = bk._graph_terms(cfg, g)
        prior = jnp.ones((KF, bk.D), jnp.float32)
        return bk._hv(fi, fj, Ji, Jj, info, prior, v)

    print(f"terms+1hv_ms       {timed(hv_only, g_imu, r):8.2f}")

    for k in (4, 8, 16, 32, 48):
        cfg_k = bk.BackendConfig(max_keyframes=KF, max_loops=L,
                                 gn_iterations=1, pcg_iterations=k)
        t_k = timed(lambda gg: bk.optimize(cfg_k, gg), g_imu)
        print(f"sweep_pcg{k:<3d}_ms    {t_k:8.2f}")


if __name__ == "__main__":
    main()
