"""Parity tests for the geometry core against independent numpy references."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pointcloud_slam_tpu.geom import fit, s2, se3, so3


def np_exp(w):
    """Independent Rodrigues reference."""
    theta = np.linalg.norm(w)
    if theta < 1e-10:
        return np.eye(3) + _np_hat(w)
    k = w / theta
    K = _np_hat(k)
    return np.eye(3) + np.sin(theta) * K + (1 - np.cos(theta)) * K @ K


def _np_hat(w):
    return np.array([[0, -w[2], w[1]], [w[2], 0, -w[0]], [-w[1], w[0], 0]])


class TestSO3:
    def test_exp_matches_rodrigues(self, rng):
        ws = rng.normal(size=(64, 3)) * 2.0
        ws[0] = 0.0
        ws[1] = [1e-9, 0, 0]
        got = np.asarray(so3.exp(jnp.asarray(ws, jnp.float32)))
        for i, w in enumerate(ws):
            np.testing.assert_allclose(got[i], np_exp(w), atol=2e-5)

    def test_exp_log_roundtrip(self, rng):
        ws = rng.normal(size=(128, 3))
        ws = ws / np.linalg.norm(ws, axis=-1, keepdims=True) * rng.uniform(0.001, 3.0, size=(128, 1))
        R = so3.exp(jnp.asarray(ws, jnp.float32))
        w_back = np.asarray(so3.log(R))
        np.testing.assert_allclose(w_back, ws, atol=5e-3)

    def test_log_near_pi(self):
        for axis in [np.array([1.0, 0, 0]), np.array([0, 1.0, 0]), np.array([1.0, 2.0, -0.5]) / np.linalg.norm([1.0, 2.0, -0.5])]:
            w = axis * 3.1410
            R = jnp.asarray(np_exp(w), jnp.float32)
            w_back = np.asarray(so3.log(R))
            np.testing.assert_allclose(w_back, w, atol=2e-2)

    def test_A_matrix_is_left_jacobian(self, rng):
        """A(w) satisfies exp(w+dw) ~ exp(A(w)dw) exp(w) to first order."""
        w = rng.normal(size=3)
        A = np.asarray(so3.A_matrix(jnp.asarray(w, jnp.float32)))
        eps = 1e-4
        for k in range(3):
            dw = np.zeros(3)
            dw[k] = eps
            lhs = np_exp(w + dw)
            rhs = np_exp(A @ dw) @ np_exp(w)
            np.testing.assert_allclose(lhs, rhs, atol=1e-6)

    def test_boxplus_boxminus(self, rng):
        Ra = so3.exp(jnp.asarray(rng.normal(size=3), jnp.float32))
        d = jnp.asarray(rng.normal(size=3) * 0.3, jnp.float32)
        Rb = so3.boxplus(Ra, d)
        np.testing.assert_allclose(np.asarray(so3.boxminus(Rb, Ra)), np.asarray(d), atol=1e-5)

    def test_quat_roundtrip(self, rng):
        ws = rng.normal(size=(32, 3)) * 2
        R = so3.exp(jnp.asarray(ws, jnp.float32))
        R2 = so3.from_quat(so3.to_quat(R))
        np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-5)

    def test_euler_roundtrip(self, rng):
        rpy = rng.uniform(-1.2, 1.2, size=(16, 3))
        R = so3.from_euler(jnp.asarray(rpy, jnp.float32))
        np.testing.assert_allclose(np.asarray(so3.to_euler(R)), rpy, atol=1e-5)

    def test_normalize(self, rng):
        R = so3.exp(jnp.asarray(rng.normal(size=3), jnp.float32))
        Rn = so3.normalize(R + jnp.asarray(rng.normal(size=(3, 3)) * 1e-3, jnp.float32))
        err = np.asarray(Rn @ Rn.T) - np.eye(3)
        assert np.abs(err).max() < 1e-5


class TestS2:
    def test_bx_orthonormal_tangent(self, rng):
        for _ in range(8):
            v = rng.normal(size=3)
            v = v / np.linalg.norm(v) * s2.GRAVITY
            B = np.asarray(s2.bx(jnp.asarray(v, jnp.float32)))
            np.testing.assert_allclose(B.T @ B, np.eye(2), atol=1e-5)
            np.testing.assert_allclose(B.T @ v, np.zeros(2), atol=1e-4)

    def test_bx_singular_chart(self):
        v = np.array([-s2.GRAVITY, 0.0, 0.0])
        B = np.asarray(s2.bx(jnp.asarray(v, jnp.float32)))
        expected = np.zeros((3, 2))
        expected[1, 1] = -1.0
        expected[2, 0] = 1.0
        np.testing.assert_allclose(B, expected, atol=1e-6)

    def test_boxplus_preserves_norm(self, rng):
        v = jnp.asarray([0.1, -0.3, -9.79], jnp.float32)
        v = s2.normalize(v)
        d = jnp.asarray(rng.normal(size=2) * 0.5, jnp.float32)
        v2 = s2.boxplus(v, d)
        np.testing.assert_allclose(float(jnp.linalg.norm(v2)), s2.GRAVITY, rtol=1e-5)

    def test_boxplus_boxminus_roundtrip(self, rng):
        v = s2.normalize(jnp.asarray(rng.normal(size=3), jnp.float32))
        d = jnp.asarray(rng.normal(size=2) * 0.4, jnp.float32)
        v2 = s2.boxplus(v, d)
        d_back = s2.boxminus(v2, v)
        # boxminus returns the geodesic tangent; applying it must reproduce v2
        v3 = s2.boxplus(v, d_back)
        np.testing.assert_allclose(np.asarray(v3), np.asarray(v2), atol=1e-4)

    def test_nx_mx_inverse_consistency(self, rng):
        """Nx(y,y) @ Mx(y, 0) == I_2 (projection of retraction at zero)."""
        v = s2.normalize(jnp.asarray(rng.normal(size=3), jnp.float32))
        Nx = np.asarray(s2.nx_yy(v))
        Mx = np.asarray(s2.mx(v, jnp.zeros(2, jnp.float32)))
        np.testing.assert_allclose(Nx @ Mx, np.eye(2), atol=1e-5)

    def test_mx_finite_difference(self, rng):
        """Mx(v, delta) is d(boxplus)/d(delta)."""
        v = s2.normalize(jnp.asarray(rng.normal(size=3), jnp.float64 if jax.config.jax_enable_x64 else jnp.float32))
        delta = jnp.asarray(rng.normal(size=2) * 0.3, jnp.float32)
        Mx = np.asarray(s2.mx(v, delta))
        eps = 1e-3
        for k in range(2):
            dd = np.zeros(2, np.float32)
            dd[k] = eps
            plus = np.asarray(s2.boxplus(v, delta + jnp.asarray(dd)))
            minus = np.asarray(s2.boxplus(v, delta - jnp.asarray(dd)))
            fd = (plus - minus) / (2 * eps)
            np.testing.assert_allclose(Mx[:, k], fd, atol=5e-3)


class TestSE3:
    def test_compose_inverse(self, rng):
        a = se3.Pose(so3.exp(jnp.asarray(rng.normal(size=3), jnp.float32)), jnp.asarray(rng.normal(size=3), jnp.float32))
        ident = a.compose(a.inverse())
        np.testing.assert_allclose(np.asarray(ident.R), np.eye(3), atol=1e-6)
        np.testing.assert_allclose(np.asarray(ident.t), 0, atol=1e-6)

    def test_exp_log_roundtrip(self, rng):
        xi = jnp.asarray(rng.normal(size=6), jnp.float32)
        p = se3.exp(xi)
        np.testing.assert_allclose(np.asarray(se3.log(p)), np.asarray(xi), atol=1e-5)

    def test_apply(self, rng):
        p = se3.exp(jnp.asarray(rng.normal(size=6) * 0.5, jnp.float32))
        pts = jnp.asarray(rng.normal(size=(3, 10)), jnp.float32)
        got = p.apply(pts)
        want = np.asarray(p.R) @ np.asarray(pts) + np.asarray(p.t)[:, None]
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


class TestFit:
    def test_eigh3x3_matches_lapack(self, rng):
        A = rng.normal(size=(256, 3, 3))
        A = A + np.swapaxes(A, -1, -2)
        vals, vecs = fit.eigh3x3(jnp.asarray(A, jnp.float32))
        vals_ref = np.linalg.eigvalsh(A)
        np.testing.assert_allclose(np.asarray(vals), vals_ref, atol=1e-4)
        # eigenvector property: A v = lambda v
        for k in range(3):
            Av = np.einsum("bij,bj->bi", A, np.asarray(vecs[..., k]))
            lv = vals_ref[:, k, None] * np.asarray(vecs[..., k])
            np.testing.assert_allclose(Av, lv, atol=5e-3)

    def test_eigh3x3_repeated_eigenvalues(self):
        A = jnp.asarray(np.diag([2.0, 2.0, 5.0]), jnp.float32)[None]
        vals, vecs = fit.eigh3x3(A)
        np.testing.assert_allclose(np.asarray(vals[0]), [2, 2, 5], atol=1e-5)
        V = np.asarray(vecs[0])
        np.testing.assert_allclose(V.T @ V, np.eye(3), atol=1e-5)

    def test_eigh_small_matches_lapack(self, rng):
        for n in (3, 6):
            A = rng.normal(size=(n, n))
            A = A + A.T
            vals, vecs = fit.eigh_small(jnp.asarray(A, jnp.float32))
            vals_ref = np.linalg.eigvalsh(A)
            np.testing.assert_allclose(np.asarray(vals), vals_ref, atol=1e-4)
            Av = A @ np.asarray(vecs)
            lv = np.asarray(vals)[None, :] * np.asarray(vecs)
            np.testing.assert_allclose(Av, lv, atol=5e-3)
            V = np.asarray(vecs)
            np.testing.assert_allclose(V.T @ V, np.eye(n), atol=1e-4)

    def test_eigh_small_conditioned_like_loam_hessian(self, rng):
        # shaped like a degenerate scan2map Hessian: one near-zero direction
        # and spread ~1e4 (the reference threshold regime, mapOptmization
        # degeneracy guard)
        q, _ = np.linalg.qr(rng.normal(size=(6, 6)))
        w_true = np.array([1e-3, 50.0, 120.0, 3e3, 8e3, 2e4])
        A = (q * w_true) @ q.T
        vals, vecs = fit.eigh_small(jnp.asarray(A, jnp.float32))
        np.testing.assert_allclose(np.asarray(vals), w_true, rtol=2e-3, atol=1e-2)
        Av = A @ np.asarray(vecs)
        lv = np.asarray(vals)[None, :] * np.asarray(vecs)
        np.testing.assert_allclose(Av, lv, atol=np.abs(w_true).max() * 1e-3)

    def test_eigh_small_repeated_and_diagonal(self):
        vals, vecs = fit.eigh_small(jnp.asarray(np.diag([4.0, 4.0, 1.0, 9.0, 4.0, 0.0]), jnp.float32))
        np.testing.assert_allclose(np.asarray(vals), [0, 1, 4, 4, 4, 9], atol=1e-5)
        V = np.asarray(vecs)
        np.testing.assert_allclose(V.T @ V, np.eye(6), atol=1e-5)

    def test_eigh_small_grad_finite(self, rng):
        # the degeneracy projection sits inside jacfwd-linearized pipelines;
        # the backward pass must stay finite even near convergence (tiny
        # off-diagonals), which the algebraic Jacobi form fails (see docstring)
        A = rng.normal(size=(6, 6))
        A = np.asarray(A + A.T, np.float32)
        A_near = np.diag(np.asarray([1.0, 2, 3, 4, 5, 6], np.float32))
        A_near[0, 1] = A_near[1, 0] = 1e-12  # inside the VJP overflow window
        for mat in (A, A_near):
            g = jax.grad(lambda m: jnp.sum(fit.eigh_small(m)[0]))(jnp.asarray(mat))
            assert np.all(np.isfinite(np.asarray(g)))

    def test_plane_fit_exact(self, rng):
        # SoA layout: (3, K, N)
        pts = rng.normal(size=(5, 3))
        pts[:, 2] = 2.0  # z = 2 plane
        soa = jnp.asarray(pts.T[:, :, None], jnp.float32)  # (3, 5, 1)
        coef, valid = fit.plane_fit(soa, jnp.ones((5, 1), bool))
        coef = np.asarray(coef[:, 0])
        assert bool(valid[0])
        # plane equation: n.p + d = 0 for all points
        resid = pts @ coef[:3] + coef[3]
        np.testing.assert_allclose(resid, 0, atol=1e-4)

    def test_plane_fit_rejects_nonplanar(self, rng):
        pts = rng.normal(size=(5, 3)) * 5
        soa = jnp.asarray(pts.T[:, :, None], jnp.float32)
        _, valid = fit.plane_fit(soa, jnp.ones((5, 1), bool), threshold=0.01)
        assert not bool(valid[0])

    def test_plane_fit_respects_mask(self, rng):
        pts = rng.normal(size=(5, 3))
        pts[:, 2] = 1.0
        pts_bad = np.concatenate([pts, [[0, 0, 50.0]]], axis=0)  # outlier masked away
        mask = np.array([True] * 5 + [False])
        soa = jnp.asarray(pts_bad.T[:, :, None], jnp.float32)
        coef, valid = fit.plane_fit(soa, jnp.asarray(mask[:, None]))
        assert bool(valid[0])
        resid = pts @ np.asarray(coef[:3, 0]) + np.asarray(coef[3, 0])
        np.testing.assert_allclose(resid, 0, atol=1e-3)

    def test_plane_fit_min_points(self, rng):
        pts = rng.normal(size=(5, 3)).astype(np.float32)
        mask = np.zeros((5,), bool)
        mask[:2] = True  # only 2 points < min 3
        soa = jnp.asarray(pts.T[:, :, None], jnp.float32)
        _, valid = fit.plane_fit(soa, jnp.asarray(mask[:, None]))
        assert not bool(valid[0])

    def test_line_fit(self, rng):
        direction = np.array([1.0, 1.0, 0.0]) / np.sqrt(2)
        ts = np.linspace(-1, 1, 5)
        pts = ts[:, None] * direction + np.array([1.0, 2.0, 3.0]) + rng.normal(size=(5, 3)) * 1e-3
        soa = jnp.asarray(pts.T[:, :, None], jnp.float32)
        center, dirn, valid = fit.line_fit(soa, jnp.ones((5, 1), bool))
        assert bool(valid[0])
        np.testing.assert_allclose(np.abs(np.asarray(dirn[:, 0]) @ direction), 1.0, atol=1e-3)
        np.testing.assert_allclose(np.asarray(center[:, 0]), [1, 2, 3], atol=1e-2)

    def test_line_fit_rejects_plane(self):
        # symmetric planar pattern: lambda_max == lambda_mid, no dominant line
        pts = np.array([[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0], [0, 0, 0]], np.float32)
        soa = jnp.asarray(pts.T[:, :, None], jnp.float32)
        _, _, valid = fit.line_fit(soa, jnp.ones((5, 1), bool))
        assert not bool(valid[0])
