"""Shared Gauss-Newton / Levenberg-Marquardt SE(3) solver, fully jittable.

Behavioral parity target (re-designed for fixed iteration counts + masked
early-out instead of data-dependent loops):
  reference `fast_gicp/include/fast_gicp/gicp/impl/lsq_registration_impl.hpp`
  (`step_gn`, `step_lm`: LM with rho-ratio accept, lambda *= max(1/3,
  1-(2rho-1)^3) on accept, lambda *= nu, nu *= 2 on reject; convergence on
  rotation/translation epsilon) and the LOAM degeneracy guard
  `src/jueying_slam/src/mapOptmization.cpp:1508-1536` (project the update out
  of eigendirections with eigenvalue < threshold).

The user supplies `linearize(pose) -> (H (6,6), b (6,), err ())` where the
6-dim tangent ordering is [rot, trans] with LEFT-multiplicative retraction
(`se3.retract_left`), and optionally `error(pose) -> err ()` for LM's
re-evaluation (defaults to linearize()'s error — costlier but simpler).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..geom import fit, se3


@dataclasses.dataclass(frozen=True)
class SolverConfig:
    max_iterations: int = 30
    lm_max_inner: int = 6
    init_lambda_factor: float = 1e-9
    rotation_epsilon: float = 2e-3
    translation_epsilon: float = 5e-4
    # degeneracy guard: eigenvalues of H below this are projected out of the
    # update (mapOptmization.cpp LMOptimization's isDegenerate path).
    # <= 0 disables.
    degeneracy_threshold: float = 0.0


class SolveResult(NamedTuple):
    pose: se3.Pose
    iterations: jnp.ndarray  # int32, iterations actually applied
    converged: jnp.ndarray   # bool
    final_error: jnp.ndarray
    H: jnp.ndarray           # (6, 6) last linearization (degeneracy/covariance export,
    # plays the role of getFinalHessian / getMaxEigen in the reference)


def _chol_solve6(A: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Unrolled 6x6 Cholesky solve (A SPD). Scalar arithmetic only — the
    batched-LAPACK lowering of jnp.linalg.solve costs ~1-2 ms per call on TPU,
    which dominates a 30-iteration GN loop."""
    L = [[None] * 6 for _ in range(6)]
    for i in range(6):
        for j in range(i + 1):
            s = A[i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            if i == j:
                L[i][i] = jnp.sqrt(jnp.maximum(s, 1e-20))
            else:
                L[i][j] = s / L[j][j]
    # forward: L y = b
    y = [None] * 6
    for i in range(6):
        s = b[i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    # back: L^T x = y
    x = [None] * 6
    for i in range(5, -1, -1):
        s = y[i]
        for k in range(i + 1, 6):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return jnp.stack(x)


def degeneracy_projection(H: jnp.ndarray, threshold: float):
    """(degenerate, P) for the LOAM degeneracy guard: P projects an update out
    of the eigendirections of H whose eigenvalue is below `threshold`.

    Reference note (`mapOptmization.cpp:1508-1536`): the reference decomposes
    ONCE per solve at `iterCount == 0` and reuses the projector (its `matP` is
    even function-local, so iterCount > 0 reads a zero matrix — a known
    upstream LIO-SAM bug vs original LOAM where matP is a member). Cadence
    measurements on v5e (tools/profile_slam.py, baked grids): hoisting a
    single iter-0 projector fully out of the loop is SLOWER (50.9 -> 40.4
    slam_step fps — the hoist needs a standalone search phase, ~5 ms) and
    less accurate (the iter-0 Hessian — large residuals, small robust
    weights — projects out directions later re-evaluations recover);
    per-iteration `inline_projection` measures 49.5 fps; recomputing ONCE
    PER SEARCH ROUND from the round's fresh correspondences (scan2map's
    form) measures 50.9 fps at identical final error. With eigenvalues
    ascending, the reference's zero-trailing-rows-until-first-keep loop is
    exactly `keep = w > threshold`.

    Uses `jnp.linalg.eigh`: the unrolled-Jacobi `fit.eigh_small` alternative
    costs ~0.6 ms per call on v5e (a ~1350-op sequential scalar chain; 30
    in-loop calls halved slam_step throughput, 50.9 -> 26.8 fps) — prefer
    `fit.eigh_small` only where the decomposition must be differentiated
    (the LAPACK VJP has 1/(w_i - w_j) terms that blow up at repeated
    eigenvalues)."""
    w, V = jnp.linalg.eigh(H)
    keep = (w > threshold).astype(H.dtype)
    P = (V * keep[None, :]) @ V.T
    return jnp.any(w <= threshold), P


def inline_projection(H: jnp.ndarray, threshold: float):
    """Per-iteration degeneracy projection for loops that keep the guard in
    the body (the LM registration families, where the guard is an off-by-
    default extension — the reference's LsqRegistration has none). Returns
    None (zero cost) when the guard is disabled; prefer hoisting via
    `degeneracy_projection` in hot always-on paths (scan2map)."""
    return degeneracy_projection(H, threshold) if threshold > 0 else None


def _solve_step(H: jnp.ndarray, b: jnp.ndarray, lam: jnp.ndarray, proj=None) -> jnp.ndarray:
    """Solve (H + lam*I) d = -b; `proj` is an optional (degenerate, P) pair
    from `degeneracy_projection` applied to the update (None = guard off).

    The 1e-6 ridge keeps the unrolled Cholesky finite when a frame has no
    valid correspondences at all (H = b = 0 -> d = 0, a frozen pose) instead
    of emitting NaN that poisons all downstream state — observed when a
    diverged revisit left scan_to_map with zero matches."""
    A = H + (lam + 1e-6) * jnp.eye(6, dtype=H.dtype)
    d = _chol_solve6(A, -b)
    if proj is not None:
        degenerate, P = proj
        d = jnp.where(degenerate, P @ d, d)
    return d


def _converged(d: jnp.ndarray, cfg: SolverConfig) -> jnp.ndarray:
    return (jnp.max(jnp.abs(d[:3])) < cfg.rotation_epsilon) & (jnp.max(jnp.abs(d[3:])) < cfg.translation_epsilon)


def gauss_newton(linearize: Callable, x0: se3.Pose, cfg: SolverConfig = SolverConfig()) -> SolveResult:
    """Fixed-iteration GN with masked early-out (no update after convergence)."""

    def body(carry, _):
        x, done, iters, err, Hlast = carry
        H, b, e = linearize(x)
        d = _solve_step(H, b, jnp.zeros((), H.dtype), inline_projection(H, cfg.degeneracy_threshold))
        conv = _converged(d, cfg)
        x_new = se3.retract_left(x, d)
        x = jax.tree.map(lambda a, bb: jnp.where(done, a, bb), x, x_new)
        iters = iters + jnp.where(done, 0, 1)
        done = done | conv
        return (x, done, iters, e, H), None

    # carry inits derive from x0 so shard_map varying-axis typing is preserved
    zero_s = jnp.sum(x0.t) * 0
    init = (
        x0,
        zero_s > 1.0,
        zero_s.astype(jnp.int32),
        zero_s + jnp.asarray(jnp.inf, x0.t.dtype),
        jnp.zeros((6, 6), x0.t.dtype) + zero_s,
    )
    (x, done, iters, err, H), _ = jax.lax.scan(body, init, None, length=cfg.max_iterations)
    return SolveResult(x, iters, done, err, H)


def levenberg_marquardt(
    linearize: Callable,
    x0: se3.Pose,
    cfg: SolverConfig = SolverConfig(),
    error: Optional[Callable] = None,
) -> SolveResult:
    """LM with the reference's rho-ratio lambda schedule, fixed trip counts.

    Degeneracy guard (an extension here — the reference's LM, fast_gicp's
    LsqRegistration, has none): per-iteration projection of the update, from
    the current H (see degeneracy_projection); off by default."""
    if error is None:
        error = lambda x: linearize(x)[2]

    def outer(carry, _):
        x, lam, nu, done, iters, Hlast = carry
        H, b, e = linearize(x)
        proj = inline_projection(H, cfg.degeneracy_threshold)
        # lazy lambda init: first iteration uses init_lambda_factor * max diag
        lam = jnp.where(lam < 0, cfg.init_lambda_factor * jnp.max(jnp.abs(jnp.diag(H))), lam)

        def inner(carry_in):
            lam, nu, accepted, x_acc, d_acc, k = carry_in
            d = _solve_step(H, b, lam, proj)
            x_try = se3.retract_left(x, d)
            e_try = error(x_try)
            denom = jnp.dot(d, lam * d - b)
            rho = (e - e_try) / jnp.where(jnp.abs(denom) < 1e-30, 1e-30, denom)
            ok = (rho > 0) & jnp.isfinite(e_try)
            lam_next = jnp.where(
                ok, lam * jnp.maximum(1.0 / 3.0, 1.0 - (2.0 * rho - 1.0) ** 3), lam * nu
            )
            nu_next = jnp.where(ok, 2.0, 2.0 * nu)
            x_acc = jax.tree.map(lambda a, bb: jnp.where(ok, bb, a), x_acc, x_try)
            d_acc = jnp.where(ok, d, d_acc)
            return lam_next, nu_next, accepted | ok, x_acc, d_acc, k + 1

        def inner_cond(carry_in):
            _, _, accepted, _, _, k = carry_in
            return (~accepted) & (k < cfg.lm_max_inner)

        zin = jnp.sum(x.t) * 0
        lam, nu, accepted, x_new, d_new, _ = jax.lax.while_loop(
            inner_cond, inner, (lam + zin, nu + zin, zin > 1.0, x, jnp.zeros((6,), x.t.dtype) + zin, zin.astype(jnp.int32))
        )
        conv = _converged(d_new, cfg) | ~accepted
        x = jax.tree.map(lambda a, bb: jnp.where(done, a, bb), x, x_new)
        iters = iters + jnp.where(done, 0, 1)
        done = done | conv
        return (x, lam, nu, done, iters, H), e

    zero_s = jnp.sum(x0.t) * 0
    init = (
        x0,
        zero_s - 1.0,
        zero_s + 2.0,
        zero_s > 1.0,
        zero_s.astype(jnp.int32),
        jnp.zeros((6, 6), x0.t.dtype) + zero_s,
    )
    (x, lam, nu, done, iters, H), errs = jax.lax.scan(outer, init, None, length=cfg.max_iterations)
    return SolveResult(x, iters, done, errs[-1], H)
