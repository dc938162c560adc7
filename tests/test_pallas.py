"""Pallas kernel tests (interpret-compatible on CPU; compiled on TPU)."""

import numpy as np
import jax.numpy as jnp

from pointcloud_slam_tpu import native
from pointcloud_slam_tpu.ops.pallas import knn, nearest_neighbor, pad_cloud


class TestBruteForceNN:
    def test_matches_oracle(self, rng):
        db = rng.uniform(-5, 5, size=(1024, 3)).astype(np.float32)
        q = rng.uniform(-5, 5, size=(256, 3)).astype(np.float32)
        d2, idx = nearest_neighbor(jnp.asarray(q.T), jnp.asarray(db.T), bq=256, bm=512)
        idx_o, d2_o = native.knn(db, q, 1)
        np.testing.assert_array_equal(np.asarray(idx), idx_o[:, 0])
        np.testing.assert_allclose(np.asarray(d2), d2_o[:, 0], rtol=1e-4, atol=1e-4)

    def test_self_nn_is_zero(self, rng):
        pts = rng.uniform(-2, 2, size=(512, 3)).astype(np.float32)
        d2, idx = nearest_neighbor(jnp.asarray(pts.T), jnp.asarray(pts.T), bq=256, bm=512)
        np.testing.assert_allclose(np.asarray(d2), 0.0, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(idx), np.arange(512))


class TestBruteForceKNN:
    def test_matches_oracle(self, rng):
        """Exact k-NN parity vs the C++ oracle (the brute_force_knn.cu role)."""
        k = 8
        db = rng.uniform(-5, 5, size=(1024, 3)).astype(np.float32)
        q = rng.uniform(-5, 5, size=(256, 3)).astype(np.float32)
        d2, idx = knn(jnp.asarray(q.T), jnp.asarray(db.T), k=k, bq=256, bm=512)
        idx_o, d2_o = native.knn(db, q, k)
        # index packing truncates 9 low mantissa bits, so near-ties at
        # <=2^-14 relative distance may swap ORDER; compare as sets + dists
        np.testing.assert_array_equal(np.sort(np.asarray(idx).T, axis=1), np.sort(idx_o, axis=1))
        np.testing.assert_allclose(np.sort(np.asarray(d2).T, axis=1), np.sort(d2_o, axis=1), rtol=1e-3, atol=1e-4)

    def test_sorted_and_self_first(self, rng):
        pts = rng.uniform(-3, 3, size=(512, 3)).astype(np.float32)
        d2, idx = knn(jnp.asarray(pts.T), jnp.asarray(pts.T), k=4, bq=256, bm=512)
        d2 = np.asarray(d2)
        assert np.all(np.diff(d2, axis=0) >= 0), "distances must ascend"
        np.testing.assert_allclose(d2[0], 0.0, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(idx)[0], np.arange(512))

    def test_pad_cloud_masks(self, rng):
        """Masked points are never selected; padding reaches the tile multiple."""
        pts = rng.uniform(-2, 2, size=(3, 300)).astype(np.float32)
        mask = np.ones(300, bool)
        mask[150:] = False
        q = pad_cloud(jnp.asarray(pts), jnp.asarray(mask), 256)
        db = pad_cloud(jnp.asarray(pts), jnp.asarray(mask), 512)
        assert q.shape[1] == 512 and db.shape[1] == 512
        d2, idx = knn(q, db, k=4, bq=256, bm=512)
        live = np.asarray(idx)[:, :150]
        assert live.max() < 150, "a masked/padded point was selected as neighbor"
