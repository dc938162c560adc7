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
    _ = np.asarray(fn(*args))  # compile + readback (ONE scalar)
    t0 = time.perf_counter()
    for _ in range(reps):
        _ = np.asarray(fn(*args))
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    KF, L = 5120, 256
    cfg, g, g_imu, t_true = bench.build_backend_graph(KF, L)

    # every probe fn returns ONE scalar: each device->host readback pays the
    # full axon tunnel roundtrip (~28 ms), so multi-output fetches would
    # poison the timing
    terms = jax.jit(lambda g: sum(jnp.sum(x) for x in bk._graph_terms(cfg, g)[2:6]))
    print(f"terms_ms           {timed(terms, g_imu):8.2f}")

    def _blocks(g):
        fi, fj, Ji, Jj, e, info, B = bk._graph_terms(cfg, g)
        prior = jnp.ones((KF, bk.D), jnp.float32)
        Dblk = bk._precond_blocks(KF, jnp.float32, fi, fj, Ji, Jj, info, prior)
        return Dblk, B

    blocks_s = jax.jit(lambda g: sum(jnp.sum(x) for x in _blocks(g)))
    print(f"terms+blocks_ms    {timed(blocks_s, g_imu):8.2f}")

    Dblk, B = jax.jit(_blocks)(g_imu)
    Dblk, B = jax.tree.map(jnp.asarray, (Dblk, B))

    @jax.jit
    def factor(Dblk, B):
        levels, (chol, n) = bk.chain_factor(Dblk, B)
        s = jnp.sum(chol)
        for lv in levels:
            s = s + jnp.sum(lv["A"][0])
        return s

    print(f"chain_factor_ms    {timed(factor, Dblk, B):8.2f}")

    r = jnp.ones((KF, bk.D), jnp.float32)

    @jax.jit
    def solve_once(Dblk, B, r):
        levels, tail = bk.chain_factor(Dblk, B)
        return jnp.sum(bk.chain_solve(levels, tail, r))

    print(f"factor+1solve_ms   {timed(solve_once, Dblk, B, r):8.2f}")

    @jax.jit
    def solve_16(Dblk, B, r):
        levels, tail = bk.chain_factor(Dblk, B)
        def body(x, _):
            return bk.chain_solve(levels, tail, x), None
        x, _ = jax.lax.scan(body, r, None, length=16)
        return jnp.sum(x)

    print(f"factor+16solve_ms  {timed(solve_16, Dblk, B, r):8.2f}")

    @jax.jit
    def hv_only(g, v):
        fi, fj, Ji, Jj, e, info, _ = bk._graph_terms(cfg, g)
        prior = jnp.ones((KF, bk.D), jnp.float32)
        return jnp.sum(bk._hv(fi, fj, Ji, Jj, info, prior, v))

    print(f"terms+1hv_ms       {timed(hv_only, g_imu, r):8.2f}")

    @jax.jit
    def hv_16(g, v):
        fi, fj, Ji, Jj, e, info, _ = bk._graph_terms(cfg, g)
        prior = jnp.ones((KF, bk.D), jnp.float32)
        def body(x, _):
            return bk._hv(fi, fj, Ji, Jj, info, prior, x), None
        x, _ = jax.lax.scan(body, v, None, length=16)
        return jnp.sum(x)

    print(f"terms+16hv_ms      {timed(hv_16, g_imu, r):8.2f}")

    for k in (4, 8, 16, 32, 48):
        cfg_k = bk.BackendConfig(max_keyframes=KF, max_loops=L,
                                 gn_iterations=1, pcg_iterations=k)
        opt_k = jax.jit(lambda gg, _c=cfg_k: jnp.sum(bk.optimize(_c, gg).t))
        print(f"sweep_pcg{k:<3d}_ms    {timed(opt_k, g_imu):8.2f}")


if __name__ == "__main__":
    main()
