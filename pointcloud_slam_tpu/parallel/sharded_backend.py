"""Factor-sharded pose-graph solve over a device mesh.

The SURVEY §2.5 "map-space sharding" analogue for the back-end: the factor
set (odometry + loop + IMU + bias-walk between factors) is split across
devices; each device linearizes and scatter-accumulates only its factor
shard, and the per-PCG-iteration H@v product plus the right-hand side and the
Jacobi block preconditioner are combined with `psum` over ICI. Node state
(KF, 15) stays replicated — at 5k keyframes that is a ~300 KB all-reduce per
PCG iteration, ICI-cheap, while the per-factor einsums (the actual FLOPs)
scale 1/n_devices.

Numerically identical to `backend.optimize` (same factors, same PCG); the
test suite checks exact agreement on a CPU mesh.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.7 exposes shard_map at top level
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from ..geom import so3
from ..models.liosam import backend as bk


def sharded_optimize(mesh: Mesh, cfg: bk.BackendConfig, g: bk.PoseGraph, axis: str = "sp") -> bk.PoseGraph:
    """Gauss-Newton/PCG over the whole graph with factors sharded on `axis`."""
    n_shards = mesh.shape[axis]
    KF = cfg.max_keyframes
    dtype = g.t.dtype
    idx = jnp.arange(KF)

    def solve(g):
        active = idx < jnp.maximum(g.n, 1)
        imu_next = jnp.concatenate([g.imu_mask[1:], jnp.zeros((1,), bool)])
        vb_obs = active & (g.imu_mask | imu_next)
        rank = jax.lax.axis_index(axis)

        def gn_step(g, _):
            # this device's slot shard: linearization (including the vmapped
            # jacfwd IMU factors) runs ONLY on these slots — KF/n_shards
            # keyframe slots + L/n_shards loop slots per device. Padding
            # slots beyond the table carry zero information.
            KFc = -(-KF // n_shards)
            Lc = -(-cfg.max_loops // n_shards)
            kf_slots = rank * KFc + jnp.arange(KFc)
            loop_slots = rank * Lc + jnp.arange(Lc)
            fi, fj, Ji, Jj, e, info, Bp = bk._graph_terms(cfg, g, kf_slots, loop_slots)
            # partial sub-diagonal blocks -> full chain for the preconditioner
            B = jax.lax.psum(Bp, axis)

            pose_prior = jnp.where((idx == 0) & active, cfg.prior_info, jnp.where(active, 0.0, 1.0))
            vb_prior = jnp.where(
                (idx == 0) & active, jnp.maximum(cfg.prior_info * 1e-4, 1.0), jnp.where(vb_obs, 0.0, 1.0)
            )
            prior_diag = jnp.concatenate(
                [jnp.repeat(pose_prior[:, None], 6, axis=1), jnp.repeat(vb_prior[:, None], 9, axis=1)],
                axis=1,
            )
            gpsw3 = g.prior_info * g.prior_mask[:, None]
            gpsw = jnp.zeros((KF, bk.D), dtype).at[:, 3:6].set(gpsw3)
            prior_diag = prior_diag + gpsw

            w_e = info * e
            b = jnp.zeros((KF, bk.D), dtype)
            b = b.at[fi].add(jnp.einsum("fba,fb->fa", Ji, w_e))
            b = b.at[fj].add(jnp.einsum("fba,fb->fa", Jj, w_e))
            b = jax.lax.psum(b, axis)
            gps_r = jnp.einsum("kij,kj->ki", jnp.swapaxes(g.R, -1, -2), g.prior_pos - g.t)
            b = b - gpsw * jnp.zeros((KF, bk.D), dtype).at[:, 3:6].set(gps_r)

            blocks = jnp.zeros((KF, bk.D, bk.D), dtype)
            blocks = blocks.at[fi].add(jnp.einsum("fba,fb,fbc->fac", Ji, info, Ji))
            blocks = blocks.at[fj].add(jnp.einsum("fba,fb,fbc->fac", Jj, info, Jj))
            blocks = jax.lax.psum(blocks, axis)
            blocks = blocks + jax.vmap(jnp.diag)(prior_diag) + 1e-6 * jnp.eye(bk.D, dtype=dtype)
            # exact chain preconditioner (replicated; B comes from the full
            # sequential families, the psum'd blocks are the full diagonal)
            levels, top_inv = bk.chain_factor(blocks, B)

            def hv(v):
                fv = jnp.einsum("fab,fb->fa", Ji, v[fi]) + jnp.einsum("fab,fb->fa", Jj, v[fj])
                w = info * fv
                out = jnp.zeros_like(v)
                out = out.at[fi].add(jnp.einsum("fba,fb->fa", Ji, w))
                out = out.at[fj].add(jnp.einsum("fba,fb->fa", Jj, w))
                return jax.lax.psum(out, axis) + prior_diag * v

            x = jnp.zeros((KF, bk.D), dtype)
            r = -b - hv(x)
            z = bk.chain_solve(levels, top_inv, r)
            p = z
            rz = jnp.sum(r * z)

            def pcg(carry, _):
                x, r, p, rz = carry
                Ap = hv(p)
                denom = jnp.sum(p * Ap)
                alpha = rz / jnp.where(jnp.abs(denom) < 1e-20, 1e-20, denom)
                x = x + alpha * p
                r = r - alpha * Ap
                z = bk.chain_solve(levels, top_inv, r)
                rz_new = jnp.sum(r * z)
                beta = rz_new / jnp.where(jnp.abs(rz) < 1e-20, 1e-20, rz)
                p = z + beta * p
                return (x, r, p, rz_new), None

            (dx, _, _, _), _ = jax.lax.scan(pcg, (x, r, p, rz), None, length=cfg.pcg_iterations)
            dx = jnp.where(active[:, None], dx, 0.0)
            # mirror backend.optimize's trust region exactly (dx is already
            # replicated after the psum'd PCG, so the scale agrees per device)
            step_max = jnp.max(jnp.abs(dx[:, 0:6]))
            dx = dx * jnp.minimum(1.0, cfg.max_step / jnp.maximum(step_max, 1e-12))
            return g._replace(
                R=g.R @ so3.exp(dx[:, 0:3]),
                t=g.t + jnp.einsum("kij,kj->ki", g.R, dx[:, 3:6]),
                vel=g.vel + dx[:, 6:9],
                bg=g.bg + dx[:, 9:12],
                ba=g.ba + dx[:, 12:15],
            ), None

        g, _ = jax.lax.scan(gn_step, g, None, length=cfg.gn_iterations)
        return g

    fn = shard_map(
        solve,
        mesh=mesh,
        in_specs=(P(),),
        out_specs=P(),
        check_vma=False,
    )
    return jax.jit(fn)(g)
