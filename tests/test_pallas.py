"""Pallas kernel tests (interpret-compatible on CPU; compiled on TPU)."""

import numpy as np
import jax.numpy as jnp

from pointcloud_slam_tpu import native
from pointcloud_slam_tpu.ops.pallas import nearest_neighbor


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
