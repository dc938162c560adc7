#!/usr/bin/env python
"""Primitive costs for the LIO loop: sort, scatter, knn by grid config. Dev tool."""
import sys, time
sys.path.insert(0, ".")
import numpy as np, jax, jax.numpy as jnp
from pointcloud_slam_tpu import ops
from pointcloud_slam_tpu.io import synthetic

B = 16  # chain everything 16x to amortize the ~40 ms tunnel floor
world = synthetic.make_room_cloud(80_000, seed=3, size=30.0)
rng = np.random.default_rng(0)
pts = jnp.asarray(world[rng.choice(len(world), 20_000)].T.astype(np.float32))
mask = jnp.ones(20_000, bool)
slot = jnp.asarray(rng.integers(0, 1 << 17, 20_000).astype(np.int32))

def timeit(tag, f, reps=4):
    _ = np.asarray(jax.tree.leaves(f())[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        _ = np.asarray(jax.tree.leaves(f())[0].ravel()[0])
    dt = (time.perf_counter() - t0) / reps
    print(f"{tag:52s} {dt*1e3:8.2f} ms total  {(dt*1e3-40)/B:7.3f} ms/op(est)", flush=True)

# argsort 20k, chained B times
timeit("argsort 20k x16", jax.jit(lambda: jax.lax.map(lambda s: jnp.argsort(s + 0), jnp.broadcast_to(slot, (B, 20_000)))))
# voxel_downsample chained
timeit("voxel_downsample 20k x16", jax.jit(lambda: jax.lax.map(lambda p: ops.voxel_downsample(p, mask, 0.3)[0], jnp.broadcast_to(pts, (B, 3, 20_000)))))

for probe, K in ((8, 8), (4, 4)):
    cfg = ops.GridConfig(capacity=1 << 17, pts_per_voxel=K, resolution=0.4, probe=probe, nearby=7)
    g0 = ops.insert(cfg, ops.create(cfg), pts, mask)
    def chain_insert(cfg=cfg, g0=g0):
        def body(g, p):
            return ops.insert(cfg, g, p, mask), 0
        g, _ = jax.lax.scan(body, g0, jnp.broadcast_to(pts, (B, 3, 20_000)))
        return g.npts
    timeit(f"insert 20k x16 (probe={probe}, K={K})", jax.jit(chain_insert))
    def chain_knn(cfg=cfg, g0=g0):
        return jax.lax.map(lambda p: ops.knn(cfg, g0, p, k=5, max_range=5.0)[1], jnp.broadcast_to(pts, (B, 3, 20_000)))
    timeit(f"knn 20k x16 (probe={probe}, K={K})", jax.jit(chain_knn))
