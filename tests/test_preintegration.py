"""IMU preintegration factor tests."""

import numpy as np
import jax.numpy as jnp

from pointcloud_slam_tpu.geom import so3
from pointcloud_slam_tpu.models.lio import preintegration as pim


class TestPreintegration:
    def test_constant_accel_residual_vanishes(self):
        M, dt = 50, 0.01
        g = jnp.asarray([0.0, 0.0, -9.809])
        acc_w = jnp.asarray([1.0, 0.0, 0.0])
        accs = jnp.tile(acc_w - g, (M, 1))
        p = pim.preintegrate(accs, jnp.zeros((M, 3)), jnp.full(M, dt), jnp.ones(M, bool), jnp.zeros(3), jnp.zeros(3))
        T = M * dt
        vi, pi_ = jnp.zeros(3), jnp.zeros(3)
        vj = vi + acc_w * T
        pj = pi_ + vi * T + 0.5 * acc_w * T * T
        r = pim.residual(p, jnp.eye(3), pi_, vi, jnp.eye(3), pj, vj, jnp.zeros(3), jnp.zeros(3), g)
        assert float(jnp.abs(r).max()) < 1e-3

    def test_rotation_delta(self):
        M, dt = 40, 0.005
        g = jnp.asarray([0.0, 0.0, -9.809])
        w = jnp.asarray([0.0, 0.0, 1.0])
        accs = jnp.zeros((M, 3))
        p = pim.preintegrate(accs, jnp.tile(w, (M, 1)), jnp.full(M, dt), jnp.ones(M, bool), jnp.zeros(3), jnp.zeros(3))
        expected = so3.exp(w * M * dt)
        np.testing.assert_allclose(np.asarray(p.dR), np.asarray(expected), atol=1e-4)

    def test_bias_jacobian_direction(self):
        M, dt = 30, 0.01
        accs = jnp.tile(jnp.asarray([0.0, 0, 9.809]), (M, 1))
        p = pim.preintegrate(accs, jnp.zeros((M, 3)), jnp.full(M, dt), jnp.ones(M, bool), jnp.zeros(3), jnp.zeros(3))
        # finite-difference check of the gyro-bias Jacobian of Log(dR)
        eps = 1e-3
        for k in range(3):
            db = np.zeros(3, np.float32)
            db[k] = eps
            p2 = pim.preintegrate(accs, jnp.zeros((M, 3)), jnp.full(M, dt), jnp.ones(M, bool), jnp.asarray(db), jnp.zeros(3))
            fd = np.asarray(so3.log(p.dR.T @ p2.dR)) / eps
            np.testing.assert_allclose(np.asarray(p.dR_dbg)[:, k], fd, atol=2e-2)

    def test_failure_detection(self):
        assert not bool(pim.failure_detection(jnp.zeros(3), jnp.zeros(3), jnp.zeros(3)))
        assert bool(pim.failure_detection(jnp.asarray([40.0, 0, 0]), jnp.zeros(3), jnp.zeros(3)))
        assert bool(pim.failure_detection(jnp.zeros(3), jnp.asarray([2.0, 0, 0]), jnp.zeros(3)))
