"""Batched geometric fitting primitives: plane fit, line fit, 3x3 symmetric eigen.

Parity targets (math re-derived):
  - plane fit:  reference `src/jueying_lio/include/common_lib.h:186-243`
    (`common::esti_plane`: solve A n = -1, normalize, residual-threshold test)
  - line fit:   reference `src/jueying_slam/src/mapOptmization.cpp:1283-1347`
    (corner fit: 5-NN covariance eigendecomposition, lambda_max > 3*lambda_mid)
  - 3x3 eigh:   analytic (Cardano + cross-product eigenvectors) instead of an
    iterative LAPACK path, so thousands of tiny problems vectorize on the VPU.

TPU layout convention (structure-of-arrays): point blocks are (3, K, N) —
coordinate axis leading, the big point axis minor so it maps onto the 128
vector lanes. All solves are closed-form component arithmetic; there is no
batched LAPACK anywhere on the hot path.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-12


def _eigvals3x3(a00, a01, a02, a11, a12, a22):
    """Cardano eigenvalues of symmetric 3x3 given by components. Ascending (3 arrays)."""
    q = (a00 + a11 + a22) / 3.0
    b00, b11, b22 = a00 - q, a11 - q, a22 - q
    p2 = (b00 * b00 + b11 * b11 + b22 * b22 + 2.0 * (a01 * a01 + a02 * a02 + a12 * a12)) / 6.0
    p = jnp.sqrt(jnp.maximum(p2, _EPS))
    inv_p = 1.0 / p
    c00, c11, c22 = b00 * inv_p, b11 * inv_p, b22 * inv_p
    c01, c02, c12 = a01 * inv_p, a02 * inv_p, a12 * inv_p
    detB = (
        c00 * (c11 * c22 - c12 * c12)
        - c01 * (c01 * c22 - c12 * c02)
        + c02 * (c01 * c12 - c11 * c02)
    )
    r = jnp.clip(detB / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    two_p = 2.0 * p
    lam_max = q + two_p * jnp.cos(phi)
    lam_min = q + two_p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    lam_mid = 3.0 * q - lam_max - lam_min
    iso = p2 < _EPS
    lam_min = jnp.where(iso, q, lam_min)
    lam_mid = jnp.where(iso, q, lam_mid)
    lam_max = jnp.where(iso, q, lam_max)
    return lam_min, lam_mid, lam_max


def _eigvec3x3(a00, a01, a02, a11, a12, a22, lam):
    """Eigenvector for eigenvalue lam: largest cross product of rows of (A - lam I)."""
    m00, m11, m22 = a00 - lam, a11 - lam, a22 - lam
    # rows: (m00, a01, a02), (a01, m11, a12), (a02, a12, m22)
    c01x = a01 * a12 - a02 * m11
    c01y = a02 * a01 - m00 * a12
    c01z = m00 * m11 - a01 * a01
    c02x = a01 * m22 - a02 * a12
    c02y = a02 * a02 - m00 * m22
    c02z = m00 * a12 - a01 * a02
    c12x = m11 * m22 - a12 * a12
    c12y = a12 * a02 - a01 * m22
    c12z = a01 * a12 - m11 * a02
    n01 = c01x * c01x + c01y * c01y + c01z * c01z
    n02 = c02x * c02x + c02y * c02y + c02z * c02z
    n12 = c12x * c12x + c12y * c12y + c12z * c12z
    use01 = (n01 >= n02) & (n01 >= n12)
    use02 = (~use01) & (n02 >= n12)
    vx = jnp.where(use01, c01x, jnp.where(use02, c02x, c12x))
    vy = jnp.where(use01, c01y, jnp.where(use02, c02y, c12y))
    vz = jnp.where(use01, c01z, jnp.where(use02, c02z, c12z))
    nrm2 = jnp.maximum(vx * vx + vy * vy + vz * vz, _EPS)
    degenerate = nrm2 <= _EPS * 2
    vx = jnp.where(degenerate, 1.0, vx)
    vy = jnp.where(degenerate, 0.0, vy)
    vz = jnp.where(degenerate, 0.0, vz)
    inv = 1.0 / jnp.sqrt(jnp.maximum(vx * vx + vy * vy + vz * vz, _EPS))
    return vx * inv, vy * inv, vz * inv


def eigh3x3_soa(a00, a01, a02, a11, a12, a22):
    """Full analytic eigendecomposition from components, each (...,).

    Returns (vals (3, ...) ascending, vecs (3, 3, ...)) where vecs[i] is the
    i-th eigenvector (ascending) and vecs[i][c] its c-th component.
    """
    lmin, lmid, lmax = _eigvals3x3(a00, a01, a02, a11, a12, a22)
    v0 = _eigvec3x3(a00, a01, a02, a11, a12, a22, lmin)
    v2 = _eigvec3x3(a00, a01, a02, a11, a12, a22, lmax)
    # orthogonalize v2 against v0 (repeated eigenvalue robustness)
    dot = v2[0] * v0[0] + v2[1] * v0[1] + v2[2] * v0[2]
    w = tuple(v2[i] - dot * v0[i] for i in range(3))
    wn2 = w[0] ** 2 + w[1] ** 2 + w[2] ** 2
    # fallback: any vector orthogonal to v0
    alt = (-v0[1], v0[0], jnp.zeros_like(v0[0]))
    altn2 = alt[0] ** 2 + alt[1] ** 2
    alt2 = (-v0[2], jnp.zeros_like(v0[0]), v0[0])
    use_alt2 = altn2 < 1e-12
    alt = tuple(jnp.where(use_alt2, alt2[i], alt[i]) for i in range(3))
    altn2 = jnp.where(use_alt2, alt[0] ** 2 + alt[2] ** 2, altn2)
    bad = wn2 < 1e-12
    w = tuple(jnp.where(bad, alt[i], w[i]) for i in range(3))
    wn2 = jnp.where(bad, altn2, wn2)
    inv = 1.0 / jnp.sqrt(jnp.maximum(wn2, _EPS))
    v2 = tuple(w[i] * inv for i in range(3))
    # middle = v2 x v0
    v1 = (
        v2[1] * v0[2] - v2[2] * v0[1],
        v2[2] * v0[0] - v2[0] * v0[2],
        v2[0] * v0[1] - v2[1] * v0[0],
    )
    vals = jnp.stack([lmin, lmid, lmax], axis=0)
    vecs = jnp.stack([jnp.stack(v0, 0), jnp.stack(v1, 0), jnp.stack(v2, 0)], axis=0)
    return vals, vecs


def eigh3x3(A: jnp.ndarray):
    """AoS convenience wrapper: (..., 3, 3) -> (vals (..., 3), vecs (..., 3, 3))
    with columns as eigenvectors (jnp.linalg.eigh convention)."""
    vals, vecs = eigh3x3_soa(
        A[..., 0, 0], A[..., 0, 1], A[..., 0, 2], A[..., 1, 1], A[..., 1, 2], A[..., 2, 2]
    )
    # vals: (3, ...) -> (..., 3); vecs: (3, 3, ...) -> (..., 3, 3) columns
    vals = jnp.moveaxis(vals, 0, -1)
    vecs = jnp.moveaxis(jnp.moveaxis(vecs, 0, -1), 0, -2)  # (..., comp, which)
    return vals, vecs


def eigh_small(A: jnp.ndarray, sweeps: int = 6):
    """Eigendecomposition of ONE small (n x n, n <= ~8) symmetric matrix by
    statically-unrolled cyclic Jacobi rotations.

    Returns ``(vals, vecs)`` in the `jnp.linalg.eigh` convention: eigenvalues
    ascending, eigenvectors as COLUMNS of ``vecs``.

    Use this ONLY where the decomposition must be differentiated: the
    `jnp.linalg.eigh` VJP contains 1/(w_i - w_j) pairing terms that overflow
    for (near-)repeated eigenvalues — exactly the near-converged /
    near-diagonal regime jacfwd-linearized pipelines hit — while this form
    differentiates cleanly (see below). It is NOT a runtime win: measured on
    v5e, one call costs ~0.6 ms (the unrolled sweeps are a ~1350-op
    sequential scalar chain) vs ~0.1-0.2 ms for the `jnp.linalg.eigh` custom
    call; putting it inside the scan2map GN loop halved slam_step throughput
    (50.9 -> 26.8 fps). Hot non-differentiated paths (the LOAM degeneracy
    guard, NDT getMaxEigen export) keep `jnp.linalg.eigh`.

    Grad-safety: the rotation angle is computed as
    ``0.5 * atan2(2 a_pq, a_pp - a_qq)``. Unlike the classic algebraic Jacobi
    form ``t = sign(th) / (|th| + sqrt(th^2 + 1))`` with
    ``th = (a_qq - a_pp) / (2 a_pq)`` — whose intermediate ``th`` overflows as
    the off-diagonal ``a_pq -> 0`` and poisons the backward pass — the atan2
    derivative ``(x, -y)/(x^2 + y^2)`` stays finite whenever the pair is not
    exactly (0, 0), so the whole decomposition differentiates cleanly.

    `sweeps` full cyclic sweeps are unrolled at trace time; Jacobi converges
    quadratically, so 6 sweeps reach float32 roundoff for n = 6 even with
    eigenvalue spreads of ~1e7.
    """
    n = A.shape[-1]
    A = (A + A.T) * 0.5
    V = jnp.eye(n, dtype=A.dtype)
    for _ in range(sweeps):
        for p in range(n - 1):
            for q in range(p + 1, n):
                # zero a_pq: 2*theta = atan2(2 a_pq, a_pp - a_qq)
                theta = 0.5 * jnp.arctan2(2.0 * A[p, q], A[p, p] - A[q, q])
                c, s = jnp.cos(theta), jnp.sin(theta)
                # A <- G^T A G with G the (p, q)-plane rotation [[c, -s], [s, c]]
                col_p, col_q = A[:, p], A[:, q]
                A = A.at[:, p].set(c * col_p + s * col_q)
                A = A.at[:, q].set(c * col_q - s * col_p)
                row_p, row_q = A[p, :], A[q, :]
                A = A.at[p, :].set(c * row_p + s * row_q)
                A = A.at[q, :].set(c * row_q - s * row_p)
                vcol_p, vcol_q = V[:, p], V[:, q]
                V = V.at[:, p].set(c * vcol_p + s * vcol_q)
                V = V.at[:, q].set(c * vcol_q - s * vcol_p)
        A = (A + A.T) * 0.5  # contain drift between sweeps
    diag = jnp.diagonal(A)
    order = jnp.argsort(diag)
    return diag[order], V[:, order]


def eigvalsh_small(A: jnp.ndarray, sweeps: int = 6) -> jnp.ndarray:
    """Ascending eigenvalues of one small symmetric matrix (see eigh_small)."""
    return eigh_small(A, sweeps=sweeps)[0]


def solve3x3_sym(a00, a01, a02, a11, a12, a22, bx, by, bz):
    """Closed-form (adjugate) solve of a symmetric 3x3 system, component arrays.

    Returns (x, y, z, det). Caller decides what to do with tiny determinants.
    """
    i00 = a11 * a22 - a12 * a12
    i01 = a02 * a12 - a01 * a22
    i02 = a01 * a12 - a02 * a11
    i11 = a00 * a22 - a02 * a02
    i12 = a01 * a02 - a00 * a12
    i22 = a00 * a11 - a01 * a01
    det = a00 * i00 + a01 * i01 + a02 * i02
    inv_det = 1.0 / jnp.where(jnp.abs(det) < _EPS, _EPS, det)
    x = (i00 * bx + i01 * by + i02 * bz) * inv_det
    y = (i01 * bx + i11 * by + i12 * bz) * inv_det
    z = (i02 * bx + i12 * by + i22 * bz) * inv_det
    return x, y, z, det


def plane_fit(pts: jnp.ndarray, mask: jnp.ndarray, threshold: float = 0.1, min_pts: int = 3):
    """Fit plane n.p + d = 0 by solving A n = -1 (reference esti_plane).

    pts: (3, K, ...), mask: (K, ...) boolean validity.
    Returns (coef (4, ...) = [n_hat, d_hat] with |n_hat| = 1, valid (...,)).
    `valid` requires >= min_pts points and every masked point within
    `threshold` of the plane — identical semantics to esti_plane.
    """
    m = mask.astype(pts.dtype)
    px, py, pz = pts[0] * m, pts[1] * m, pts[2] * m
    a00 = jnp.sum(px * px, axis=0) + 1e-6
    a01 = jnp.sum(px * py, axis=0)
    a02 = jnp.sum(px * pz, axis=0)
    a11 = jnp.sum(py * py, axis=0) + 1e-6
    a12 = jnp.sum(py * pz, axis=0)
    a22 = jnp.sum(pz * pz, axis=0) + 1e-6
    bx = -jnp.sum(px, axis=0)
    by = -jnp.sum(py, axis=0)
    bz = -jnp.sum(pz, axis=0)
    nx, ny, nz, det = solve3x3_sym(a00, a01, a02, a11, a12, a22, bx, by, bz)
    finite = jnp.isfinite(nx) & jnp.isfinite(ny) & jnp.isfinite(nz)
    nx = jnp.where(finite, nx, 0.0)
    ny = jnp.where(finite, ny, 0.0)
    nz = jnp.where(finite, nz, 0.0)
    norm = jnp.sqrt(nx * nx + ny * ny + nz * nz)
    inv_norm = 1.0 / jnp.maximum(norm, _EPS)
    nx, ny, nz = nx * inv_norm, ny * inv_norm, nz * inv_norm
    d = inv_norm[...]
    coef = jnp.stack([nx, ny, nz, d], axis=0)
    resid = jnp.abs(pts[0] * nx[None] + pts[1] * ny[None] + pts[2] * nz[None] + d[None])
    ok_resid = jnp.all(jnp.where(mask, resid <= threshold, True), axis=0)
    enough = jnp.sum(mask, axis=0) >= min_pts
    valid = ok_resid & enough & finite & (norm > _EPS)
    return coef, valid


def line_fit(pts: jnp.ndarray, mask: jnp.ndarray, ratio: float = 3.0):
    """LOAM corner line fit: centroid + covariance eigen, valid if l_max > ratio * l_mid.

    pts (3, K, ...), mask (K, ...).
    Returns (center (3, ...), direction (3, ...) unit, valid (...,)).
    """
    m = mask.astype(pts.dtype)
    cnt = jnp.maximum(jnp.sum(m, axis=0), 1.0)
    cx = jnp.sum(pts[0] * m, axis=0) / cnt
    cy = jnp.sum(pts[1] * m, axis=0) / cnt
    cz = jnp.sum(pts[2] * m, axis=0) / cnt
    dx = (pts[0] - cx[None]) * m
    dy = (pts[1] - cy[None]) * m
    dz = (pts[2] - cz[None]) * m
    a00 = jnp.sum(dx * dx, axis=0) / cnt
    a01 = jnp.sum(dx * dy, axis=0) / cnt
    a02 = jnp.sum(dx * dz, axis=0) / cnt
    a11 = jnp.sum(dy * dy, axis=0) / cnt
    a12 = jnp.sum(dy * dz, axis=0) / cnt
    a22 = jnp.sum(dz * dz, axis=0) / cnt
    vals, vecs = eigh3x3_soa(a00, a01, a02, a11, a12, a22)
    center = jnp.stack([cx, cy, cz], axis=0)
    direction = vecs[2]  # largest
    valid = (vals[2] > ratio * vals[1]) & (jnp.sum(mask, axis=0) >= 3)
    return center, direction, valid
