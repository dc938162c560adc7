"""Keyframe/loop store capacity: saturation must be a strict no-op and
host-side growth must preserve the graph bit-for-bit.

Round-4 VERDICT weak #1 repro (regression-pinned here): adding 6 keyframes at
x=0..5 to a KF=4 graph used to leave t=[0,1,2,5] with odom_t[3]=1 — a factor
claiming 1 m where the stored poses were 3 m apart, so the next solve yanked
node 3 by 2 m. The reference has no such cliff (unbounded gtsam graph +
per-keyframe disk store, mapOptmization.cpp:249-263,1868-1880); our
counterpart is safe freeze + `grow`/`grow_state` geometric growth.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from pointcloud_slam_tpu.geom import se3
from pointcloud_slam_tpu.io import synthetic
from pointcloud_slam_tpu.models.liosam import backend as bk
from pointcloud_slam_tpu.models.liosam import slam, scan2map as s2m, scancontext as sc
from pointcloud_slam_tpu.register import ICPConfig, SolverConfig

EYE = jnp.eye(3, dtype=jnp.float32)


def _fill_keyframes(cfg, g, xs):
    for x in xs:
        g = bk.add_keyframe(cfg, g, EYE, jnp.asarray([x, 0.0, 0.0], jnp.float32))
    return g


class TestBackendSaturation:
    def test_keyframe_saturation_is_noop(self):
        """The round-4 repro: 6 keyframes into a KF=4 graph."""
        cfg = bk.BackendConfig(max_keyframes=4, max_loops=4)
        g = _fill_keyframes(cfg, bk.create(cfg), [0.0, 1.0, 2.0, 3.0, 4.0, 5.0])
        assert int(g.n) == 4
        np.testing.assert_allclose(np.asarray(g.t)[:, 0], [0, 1, 2, 3], atol=1e-6)
        # every stored odometry factor must be consistent with the stored poses
        t = np.asarray(g.t)
        np.testing.assert_allclose(
            np.asarray(g.odom_t)[1:4, 0], t[1:4, 0] - t[0:3, 0], atol=1e-6
        )
        # a consistent graph is at its optimum: the solve must not move nodes
        g2 = bk.optimize(cfg, g)
        np.testing.assert_allclose(np.asarray(g2.t), t, atol=1e-4)

    def test_should_add_keyframe_gates_on_capacity(self):
        cfg = bk.BackendConfig(max_keyframes=4, max_loops=4, keyframe_dist_thresh=0.1)
        g = _fill_keyframes(cfg, bk.create(cfg), [0.0, 1.0, 2.0])
        far = jnp.asarray([10.0, 0.0, 0.0], jnp.float32)
        assert bool(bk.should_add_keyframe(cfg, g, EYE, far))
        g = _fill_keyframes(cfg, g, [3.0])
        assert int(g.n) == 4
        assert not bool(bk.should_add_keyframe(cfg, g, EYE, far))

    def test_loop_saturation_is_noop(self):
        cfg = bk.BackendConfig(max_keyframes=8, max_loops=2)
        g = _fill_keyframes(cfg, bk.create(cfg), [0.0, 1.0, 2.0, 3.0])
        info = jnp.full((6,), 100.0, jnp.float32)
        g = bk.add_loop(cfg, g, 0, 2, EYE, jnp.asarray([2.0, 0, 0], jnp.float32), info)
        g = bk.add_loop(cfg, g, 1, 3, EYE, jnp.asarray([2.0, 0, 0], jnp.float32), info)
        assert int(g.n_loops) == 2
        before = jax.tree.map(np.asarray, (g.loop_i, g.loop_j, g.loop_t, g.loop_info))
        # saturated: this must change NOTHING (previously it overwrote slot 1)
        g = bk.add_loop(cfg, g, 0, 3, EYE, jnp.asarray([99.0, 0, 0], jnp.float32), info)
        assert int(g.n_loops) == 2
        after = jax.tree.map(np.asarray, (g.loop_i, g.loop_j, g.loop_t, g.loop_info))
        for a, b in zip(before, after):
            np.testing.assert_array_equal(a, b)


class TestGrow:
    def _noisy_graph(self, cfg, n=8, seed=0):
        rng = np.random.default_rng(seed)
        g = bk.create(cfg)
        for k in range(n):
            t = np.array([k, 0.1 * rng.standard_normal(), 0.0], np.float32)
            g = bk.add_keyframe(cfg, g, EYE, jnp.asarray(t))
        info = jnp.full((6,), 50.0, jnp.float32)
        g = bk.add_loop(cfg, g, 0, n - 1, EYE,
                        jnp.asarray([float(n - 1), 0, 0], jnp.float32), info, robust=False)
        return g

    def test_grow_preserves_graph_bitwise(self):
        cfg = bk.BackendConfig(max_keyframes=8, max_loops=2)
        g = self._noisy_graph(cfg)
        cfg2, g2 = bk.grow(cfg, g)
        assert cfg2.max_keyframes == 16 and cfg2.max_loops == 4
        assert int(g2.n) == int(g.n) and int(g2.n_loops) == int(g.n_loops)
        for a, b in zip(jax.tree.leaves(g), jax.tree.leaves(g2)):
            a, b = np.asarray(a), np.asarray(b)
            np.testing.assert_array_equal(a, b[tuple(slice(0, s) for s in a.shape)])
        # padded slots are inert: identity rotations at the tail
        np.testing.assert_allclose(np.asarray(g2.R)[12], np.eye(3), atol=0)

    def test_grow_preserves_solution(self):
        cfg = bk.BackendConfig(max_keyframes=8, max_loops=2, gn_iterations=4, pcg_iterations=40)
        g = self._noisy_graph(cfg)
        cfg2, g2 = bk.grow(cfg, g)
        sol = np.asarray(bk.optimize(cfg, g).t)[:8]
        sol2 = np.asarray(bk.optimize(cfg2, g2).t)[:8]
        np.testing.assert_allclose(sol, sol2, atol=1e-3)

    def test_grow_then_continue_adding(self):
        cfg = bk.BackendConfig(max_keyframes=4, max_loops=2)
        g = _fill_keyframes(cfg, bk.create(cfg), [0.0, 1.0, 2.0, 3.0])
        assert int(g.n) == 4  # saturated
        cfg, g = bk.grow(cfg, g)
        g = _fill_keyframes(cfg, g, [4.0, 5.0])
        assert int(g.n) == 6
        t = np.asarray(g.t)
        np.testing.assert_allclose(t[:6, 0], [0, 1, 2, 3, 4, 5], atol=1e-6)
        np.testing.assert_allclose(np.asarray(g.odom_t)[1:6, 0],
                                   t[1:6, 0] - t[0:5, 0], atol=1e-6)

    def test_grow_rejects_shrink(self):
        cfg = bk.BackendConfig(max_keyframes=8, max_loops=2)
        g = bk.create(cfg)
        try:
            bk.grow(cfg, g, max_keyframes=4)
            assert False, "grow() must reject shrinking"
        except ValueError:
            pass


class TestSlamCapacity:
    """slam_step freezes safely at capacity; grow_state resumes mapping."""

    CFG = slam.SLAMConfig(
        backend=bk.BackendConfig(max_keyframes=6, max_loops=2,
                                 keyframe_dist_thresh=0.4, gn_iterations=2, pcg_iterations=16),
        n_corner=256,
        n_surf=2048,
        scan2map=s2m.Scan2MapConfig(solver=SolverConfig(max_iterations=6), degeneracy_eig=1.0),
        loop_icp=ICPConfig(solver=SolverConfig(max_iterations=4)),
        scancontext=sc.ScanContextConfig(exclude_recent=3, dist_threshold=0.35, num_candidates=4),
    )

    def test_freeze_then_grow_resumes(self):
        cfg = self.CFG
        corners_w, surfs_w = synthetic.make_feature_world()
        state = slam.create_state(cfg)

        def soa(x):
            return jnp.asarray(np.ascontiguousarray(np.asarray(x).T))

        def run(cfg, state, xs, k0):
            step = jax.jit(lambda st, c, cm, s, sm, _cfg=cfg: slam.slam_step(_cfg, st, c, cm, s, sm))
            for k, x in enumerate(xs):
                t = np.array([x, 0.0, 1.0], np.float32)
                R = np.eye(3, dtype=np.float32)
                c, cm = synthetic.take_scan(corners_w, R, t, cfg.n_corner, seed=k0 + k)
                s, sm = synthetic.take_scan(surfs_w, R, t, cfg.n_surf, seed=100 + k0 + k)
                state, out = step(state, soa(c), jnp.asarray(cm), soa(s), jnp.asarray(sm))
            return state, out

        # 9 keyframe-spaced frames into a 6-slot store: the last 3 must freeze
        xs = [0.5 * k for k in range(9)]
        state, out = run(cfg, state, xs, 0)
        assert int(state.graph.n) == 6
        t = np.asarray(state.graph.t)[:6]
        # stored odometry factors stay consistent with stored poses (no cliff)
        np.testing.assert_allclose(np.asarray(state.graph.odom_t)[1:6, 0],
                                   t[1:6, 0] - t[0:5, 0], atol=0.15)
        assert slam.needs_growth(cfg, state)

        # grow and resume: new keyframes are accepted again
        cfg, state = slam.grow_state(cfg, state)
        assert cfg.backend.max_keyframes == 12
        state, out = run(cfg, state, [4.5, 5.0, 5.5], 20)
        assert int(state.graph.n) >= 8
        # odometry kept tracking through the frozen stretch and the growth
        assert abs(float(out.pose.t[0]) - 5.5) < 0.5
