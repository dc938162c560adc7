"""Batched geometric fitting primitives: plane fit, line fit, 3x3 symmetric eigen.

Parity targets (math re-derived):
  - plane fit:  reference `src/jueying_lio/include/common_lib.h:186-243`
    (`common::esti_plane`: solve A n = -1, normalize, residual-threshold test)
  - line fit:   reference `src/jueying_slam/src/mapOptmization.cpp:1283-1347`
    (corner fit: 5-NN covariance eigendecomposition, lambda1 > 3*lambda2)
  - 3x3 eigh:   analytic (Cardano + cross-product eigenvectors) instead of an
    iterative LAPACK path, so thousands of tiny problems vectorize on the VPU.

All functions operate on a trailing (K, 3) block of points with a (K,) validity
mask and broadcast over leading batch dimensions.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-12


def eigh3x3(A: jnp.ndarray):
    """Analytic eigendecomposition of symmetric (..., 3, 3) matrices.

    Returns (eigvals (..., 3) ascending, eigvecs (..., 3, 3) with columns as
    eigenvectors), matching jnp.linalg.eigh's convention. Robust to repeated
    eigenvalues via largest-cross-product vector selection + final
    orthogonalization.
    """
    dtype = A.dtype
    q = (A[..., 0, 0] + A[..., 1, 1] + A[..., 2, 2]) / 3.0
    eye = jnp.eye(3, dtype=dtype)
    Aq = A - q[..., None, None] * eye
    p2 = jnp.sum(Aq * Aq, axis=(-1, -2)) / 6.0
    p = jnp.sqrt(jnp.maximum(p2, _EPS))
    B = Aq / p[..., None, None]
    detB = (
        B[..., 0, 0] * (B[..., 1, 1] * B[..., 2, 2] - B[..., 1, 2] * B[..., 2, 1])
        - B[..., 0, 1] * (B[..., 1, 0] * B[..., 2, 2] - B[..., 1, 2] * B[..., 2, 0])
        + B[..., 0, 2] * (B[..., 1, 0] * B[..., 2, 1] - B[..., 1, 1] * B[..., 2, 0])
    )
    r = jnp.clip(detB / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    two_p = 2.0 * p
    lam_max = q + two_p * jnp.cos(phi)
    lam_min = q + two_p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    lam_mid = 3.0 * q - lam_max - lam_min
    # nearly-isotropic matrices: eigenvalues all ~q
    iso = p2 < _EPS
    lam_min = jnp.where(iso, q, lam_min)
    lam_mid = jnp.where(iso, q, lam_mid)
    lam_max = jnp.where(iso, q, lam_max)
    vals = jnp.stack([lam_min, lam_mid, lam_max], axis=-1)

    def eigvec(lam):
        M = A - lam[..., None, None] * eye
        # candidate vectors: cross products of row pairs
        r0, r1, r2 = M[..., 0, :], M[..., 1, :], M[..., 2, :]
        c01 = jnp.cross(r0, r1)
        c02 = jnp.cross(r0, r2)
        c12 = jnp.cross(r1, r2)
        n01 = jnp.sum(c01 * c01, axis=-1)
        n02 = jnp.sum(c02 * c02, axis=-1)
        n12 = jnp.sum(c12 * c12, axis=-1)
        best01 = (n01 >= n02) & (n01 >= n12)
        best02 = (~best01) & (n02 >= n12)
        v = jnp.where(best01[..., None], c01, jnp.where(best02[..., None], c02, c12))
        n = jnp.maximum(n01, jnp.maximum(n02, n12))
        # degenerate: fall back to e_x (will be fixed by orthogonalization)
        fallback = jnp.zeros_like(v).at[..., 0].set(1.0)
        v = jnp.where((n < _EPS)[..., None], fallback, v)
        return v / jnp.linalg.norm(v, axis=-1, keepdims=True)

    v_min = eigvec(lam_min)
    v_max = eigvec(lam_max)
    # ensure orthogonality (handles repeated eigenvalues)
    v_max = v_max - jnp.sum(v_max * v_min, axis=-1, keepdims=True) * v_min
    nrm = jnp.linalg.norm(v_max, axis=-1, keepdims=True)
    alt = jnp.cross(v_min, jnp.zeros_like(v_min).at[..., 2].set(1.0))
    alt_n = jnp.linalg.norm(alt, axis=-1, keepdims=True)
    alt2 = jnp.cross(v_min, jnp.zeros_like(v_min).at[..., 1].set(1.0))
    alt = jnp.where(alt_n < 1e-6, alt2, alt)
    v_max = jnp.where(nrm < 1e-6, alt / jnp.linalg.norm(alt, axis=-1, keepdims=True), v_max / jnp.maximum(nrm, _EPS))
    v_mid = jnp.cross(v_max, v_min)
    vecs = jnp.stack([v_min, v_mid, v_max], axis=-1)  # columns
    return vals, vecs


def plane_fit(pts: jnp.ndarray, mask: jnp.ndarray, threshold: float = 0.1, min_pts: int = 3):
    """Fit plane n.p + d = 0 by solving A n = -1 (reference esti_plane).

    pts: (..., K, 3), mask: (..., K) boolean validity.
    Returns (coef (..., 4) = [n_hat, d_hat] with |n_hat| = 1, valid (...,)).
    `valid` requires >= min_pts points and every masked point within
    `threshold` of the plane — identical semantics to esti_plane.
    """
    m = mask.astype(pts.dtype)[..., None]
    A = pts * m
    b = -m[..., 0]
    AtA = jnp.einsum("...ki,...kj->...ij", A, A)
    Atb = jnp.einsum("...ki,...k->...i", A, b)
    # tiny Tikhonov keeps masked-degenerate systems solvable; fits with enough
    # well-spread points are unaffected at float32 resolution
    AtA = AtA + 1e-6 * jnp.eye(3, dtype=pts.dtype)
    n = jnp.linalg.solve(AtA, Atb[..., None])[..., 0]
    # near-singular systems (e.g. a single neighbor) can emit non-finite
    # solutions in f32; they must not poison downstream masked math
    finite = jnp.all(jnp.isfinite(n), axis=-1, keepdims=True)
    n = jnp.where(finite, n, 0.0)
    norm = jnp.linalg.norm(n, axis=-1, keepdims=True)
    safe = jnp.maximum(norm, _EPS)
    n_hat = n / safe
    d_hat = 1.0 / safe[..., 0]
    coef = jnp.concatenate([n_hat, d_hat[..., None]], axis=-1)
    resid = jnp.abs(jnp.einsum("...ki,...i->...k", pts, n_hat) + d_hat[..., None])
    ok_resid = jnp.all(jnp.where(mask, resid <= threshold, True), axis=-1)
    enough = jnp.sum(mask, axis=-1) >= min_pts
    nondegenerate = finite[..., 0] & (norm[..., 0] > _EPS)
    return coef, ok_resid & enough & nondegenerate


def line_fit(pts: jnp.ndarray, mask: jnp.ndarray, ratio: float = 3.0):
    """LOAM corner line fit: centroid + covariance eigen, valid if l_max > ratio * l_mid.

    Returns (center (..., 3), direction (..., 3) unit, valid (...,)).
    """
    m = mask.astype(pts.dtype)
    cnt = jnp.maximum(jnp.sum(m, axis=-1, keepdims=True), 1.0)
    center = jnp.sum(pts * m[..., None], axis=-2) / cnt
    d = (pts - center[..., None, :]) * m[..., None]
    cov = jnp.einsum("...ki,...kj->...ij", d, d) / cnt[..., None]
    vals, vecs = eigh3x3(cov)
    direction = vecs[..., :, 2]
    valid = (vals[..., 2] > ratio * vals[..., 1]) & (jnp.sum(m, axis=-1) >= 3)
    return center, direction, valid
