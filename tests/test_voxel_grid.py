"""Voxel-hash map tests against brute-force numpy references."""

import numpy as np
import jax.numpy as jnp

from pointcloud_slam_tpu import ops

CFG = ops.GridConfig(capacity=1 << 12, pts_per_voxel=8, resolution=0.5, nearby=7)


def soa(x):
    """host (N, 3) -> device (3, N)"""
    import jax.numpy as jnp
    return jnp.asarray(np.ascontiguousarray(x.T))


class TestInsertLookup:
    def test_insert_and_lookup(self, rng):
        pts = rng.uniform(-5, 5, size=(256, 3)).astype(np.float32)
        grid = ops.create(CFG)
        grid = ops.insert(CFG, grid, soa(pts), jnp.ones(256, bool))
        coords = ops.point_to_voxel(soa(pts), CFG.resolution)
        slots = ops.lookup(CFG, grid, coords)
        assert np.all(np.asarray(slots) >= 0), "every inserted voxel must be findable"
        # slot keys must match coords
        ks = np.asarray(grid.keys)[:, np.asarray(slots)]
        np.testing.assert_array_equal(ks, np.asarray(coords))

    def test_masked_points_not_inserted(self, rng):
        pts = rng.uniform(100, 105, size=(64, 3)).astype(np.float32)
        mask = np.zeros(64, bool)
        mask[:10] = True
        grid = ops.create(CFG)
        grid = ops.insert(CFG, grid, soa(pts), jnp.asarray(mask))
        n_vox_expected = len(np.unique(np.floor(pts[:10] / CFG.resolution).astype(np.int32), axis=0))
        assert int(ops.num_voxels(grid)) == n_vox_expected

    def test_points_accumulate_across_inserts(self, rng):
        # same voxel, two insert calls
        pts1 = np.array([[0.1, 0.1, 0.1]], np.float32)
        pts2 = np.array([[0.2, 0.2, 0.2]], np.float32)
        grid = ops.create(CFG)
        grid = ops.insert(CFG, grid, soa(pts1), jnp.ones(1, bool))
        grid = ops.insert(CFG, grid, soa(pts2), jnp.ones(1, bool))
        slot = int(ops.lookup(CFG, grid, ops.point_to_voxel(soa(pts1), CFG.resolution))[0])
        assert int(grid.npts[slot]) == 2

    def test_per_voxel_overflow_drops(self):
        # 20 points into one voxel with pts_per_voxel=8 -> count caps at 8
        pts = (np.random.default_rng(1).uniform(0, 0.49, size=(20, 3))).astype(np.float32)
        grid = ops.create(CFG)
        grid = ops.insert(CFG, grid, soa(pts), jnp.ones(20, bool))
        slot = int(ops.lookup(CFG, grid, ops.point_to_voxel(soa(pts[:1]), CFG.resolution))[0])
        assert int(grid.npts[slot]) == CFG.pts_per_voxel

    def test_in_batch_duplicate_voxels(self, rng):
        # many points in few voxels in a single batch: counts must be exact
        base = np.array([[0.25, 0.25, 0.25], [1.25, 0.25, 0.25], [0.25, 1.25, 0.25]], np.float32)
        pts = np.repeat(base, 3, axis=0) + rng.uniform(-0.1, 0.1, size=(9, 3)).astype(np.float32)
        grid = ops.create(CFG)
        grid = ops.insert(CFG, grid, soa(pts), jnp.ones(9, bool))
        coords = ops.point_to_voxel(soa(base), CFG.resolution)
        slots = np.asarray(ops.lookup(CFG, grid, coords))
        counts = np.asarray(grid.npts)[slots]
        np.testing.assert_array_equal(counts, [3, 3, 3])


class TestKNN:
    def test_knn_matches_bruteforce(self, rng):
        db = rng.uniform(-3, 3, size=(512, 3)).astype(np.float32)
        q = rng.uniform(-2, 2, size=(64, 3)).astype(np.float32)
        cfg = ops.GridConfig(capacity=1 << 13, pts_per_voxel=32, resolution=1.0, nearby=27)
        grid = ops.create(cfg)
        grid = ops.insert(cfg, grid, soa(db), jnp.ones(len(db), bool))
        nbrs, d2, cnt, _ = ops.knn(cfg, grid, soa(q), k=5, max_range=5.0)
        d2 = np.sort(np.asarray(d2).T, axis=1)
        # brute force restricted to the 27-voxel stencil neighborhood of each query
        res = cfg.resolution
        for i in range(len(q)):
            qc = np.floor(q[i] / res).astype(np.int32)
            dbc = np.floor(db / res).astype(np.int32)
            in_stencil = np.all(np.abs(dbc - qc) <= 1, axis=1)
            cand = db[in_stencil]
            if len(cand) == 0:
                assert int(cnt[i]) == 0
                continue
            bf = np.sort(np.sum((cand - q[i]) ** 2, axis=1))[:5]
            got = d2[i][: len(bf)]
            got = got[np.isfinite(got)]
            np.testing.assert_allclose(got, bf[: len(got)], rtol=1e-4, atol=1e-5)
            assert len(got) == min(5, len(bf))

    def test_knn_max_range(self, rng):
        db = np.array([[0.0, 0, 0], [10.0, 0, 0]], np.float32)
        cfg = ops.GridConfig(capacity=1 << 10, pts_per_voxel=4, resolution=8.0, nearby=7)
        grid = ops.create(cfg)
        grid = ops.insert(cfg, grid, soa(db), jnp.ones(2, bool))
        _, d2, cnt, _i = ops.knn(cfg, grid, soa(np.array([[1.0, 0, 0]], np.float32)), k=5, max_range=5.0)
        assert int(cnt[0]) == 1  # 10m point excluded by range even though in stencil

    def test_knn_empty_map(self):
        grid = ops.create(CFG)
        _, d2, cnt, _i = ops.knn(CFG, grid, jnp.zeros((3, 4), jnp.float32), k=5)
        assert np.all(np.asarray(cnt) == 0)


class TestEviction:
    def test_lru_eviction_under_pressure(self, rng):
        # tiny table: old voxels must get evicted rather than blocking inserts
        cfg = ops.GridConfig(capacity=64, pts_per_voxel=2, resolution=1.0, probe=4, nearby=1)
        grid = ops.create(cfg)
        for wave in range(8):
            pts = (rng.uniform(0, 4, size=(32, 3)) + wave * 10).astype(np.float32)
            grid = ops.insert(cfg, grid, soa(pts), jnp.ones(32, bool))
        # most recent wave must be mostly present
        coords = ops.point_to_voxel(soa(pts), cfg.resolution)
        slots = np.asarray(ops.lookup(cfg, grid, coords))
        assert (slots >= 0).mean() > 0.6


class TestDownsample:
    def test_centroid_one_per_voxel(self, rng):
        pts = rng.uniform(-2, 2, size=(256, 3)).astype(np.float32)
        out, mask = ops.voxel_downsample(soa(pts), jnp.ones(256, bool), leaf=1.0)
        out, mask = np.asarray(out).T, np.asarray(mask)
        vox = np.floor(pts / 1.0).astype(np.int32)
        uniq = np.unique(vox, axis=0)
        assert mask.sum() == len(uniq)
        # each output is its voxel's centroid
        out_vox = np.floor(out[mask] / 1.0).astype(np.int32)
        for v, c in zip(out_vox, out[mask]):
            members = pts[np.all(vox == v, axis=1)]
            np.testing.assert_allclose(c, members.mean(axis=0), atol=1e-5)

    def test_downsample_respects_mask(self, rng):
        pts = rng.uniform(-2, 2, size=(64, 3)).astype(np.float32)
        mask = np.zeros(64, bool)
        out, omask = ops.voxel_downsample(soa(pts), jnp.asarray(mask), leaf=0.5)
        assert np.asarray(omask).sum() == 0

    def test_fused_downsample_compact_matches_unfused(self, rng):
        """voxel_downsample_compact == voxel_downsample + compact as centroid
        SETS (output order is voxel-lex vs first-occurrence)."""
        pts = rng.normal(0, 6, size=(512, 3)).astype(np.float32)
        mask = rng.random(512) < 0.9
        a, am = ops.voxel_downsample(soa(pts), jnp.asarray(mask), leaf=0.5)
        b, bm = ops.voxel_downsample_compact(soa(pts), jnp.asarray(mask), leaf=0.5, budget=512)
        assert b.shape == (3, 512)
        na, nb_ = int(np.asarray(am).sum()), int(np.asarray(bm).sum())
        assert na == nb_
        sa = {tuple(r) for r in np.asarray(a)[:, np.asarray(am)].T.round(4).tolist()}
        sb = {tuple(r) for r in np.asarray(b)[:, np.asarray(bm)].T.round(4).tolist()}
        assert sa == sb
        # compacted: all valid columns are packed at the front
        bm_np = np.asarray(bm)
        assert bm_np[:nb_].all() and not bm_np[nb_:].any()

    def test_fused_downsample_compact_truncates_to_budget(self, rng):
        pts = rng.normal(0, 6, size=(512, 3)).astype(np.float32)
        out, mask = ops.voxel_downsample_compact(soa(pts), jnp.ones(512, bool), leaf=0.05, budget=64)
        assert out.shape == (3, 64)
        assert int(np.asarray(mask).sum()) == 64  # far more survivors than budget

    def test_fused_downsample_compact_empty(self):
        pts = np.zeros((16, 3), np.float32)
        out, mask = ops.voxel_downsample_compact(soa(pts), jnp.zeros(16, bool), leaf=0.5, budget=8)
        assert int(np.asarray(mask).sum()) == 0

    def test_decimate(self):
        pts = np.zeros((10, 3), np.float32)
        mask = np.ones(10, bool)
        mask[0] = False
        _, keep = ops.random_decimate(soa(pts), jnp.asarray(mask), 3)
        np.testing.assert_array_equal(np.asarray(keep), [False, True, False, False, True, False, False, True, False, False])


class TestBakedGrid:
    """Baked stencil mode: insert-side dilation, one-lookup kNN parity."""

    def test_baked_knn_matches_unbaked(self):
        rng = np.random.default_rng(11)
        pts = rng.uniform(-8, 8, (3, 4000)).astype(np.float32)
        q = rng.uniform(-7, 7, (3, 500)).astype(np.float32)
        mask = jnp.ones(4000, bool)

        cfg_u = ops.GridConfig(capacity=1 << 14, pts_per_voxel=8, resolution=1.0, probe=8, nearby=7)
        cfg_b = ops.GridConfig(capacity=1 << 14, pts_per_voxel=56, resolution=1.0, probe=8, nearby=7, baked=True)
        g_u = ops.insert(cfg_u, ops.create(cfg_u), jnp.asarray(pts), mask)
        g_b = ops.insert(cfg_b, ops.create(cfg_b), jnp.asarray(pts), mask)

        _, d2_u, cnt_u, _ = ops.knn(cfg_u, g_u, jnp.asarray(q), k=5, max_range=3.0)
        _, d2_b, cnt_b, _ = ops.knn(cfg_b, g_b, jnp.asarray(q), k=5, max_range=3.0)
        # identical candidate sets -> identical sorted distances and counts
        np.testing.assert_array_equal(np.asarray(cnt_u), np.asarray(cnt_b))
        np.testing.assert_allclose(np.asarray(d2_u), np.asarray(d2_b), rtol=1e-6)

    def test_baked_prebuilt_table_matches_internal(self):
        """knn(tbl=knn_table(...)) == knn(tbl=None) for baked grids (the
        baked fingerprint table is (probe, C), not the full rolled table)."""
        rng = np.random.default_rng(13)
        pts = rng.uniform(-8, 8, (3, 2000)).astype(np.float32)
        q = rng.uniform(-7, 7, (3, 200)).astype(np.float32)
        cfg_b = ops.GridConfig(capacity=1 << 13, pts_per_voxel=8, resolution=1.0, probe=8, nearby=7, baked=True)
        g_b = ops.insert(cfg_b, ops.create(cfg_b), jnp.asarray(pts), jnp.ones(2000, bool))
        tbl = ops.knn_table(cfg_b, g_b)
        assert tbl.shape == (cfg_b.probe, cfg_b.capacity)
        r0 = ops.knn(cfg_b, g_b, jnp.asarray(q), k=5, max_range=3.0)
        r1 = ops.knn(cfg_b, g_b, jnp.asarray(q), k=5, max_range=3.0, tbl=tbl)
        for a, b in zip(r0, r1):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_baked_capacity_drops_are_graceful(self):
        rng = np.random.default_rng(12)
        pts = rng.uniform(-2, 2, (3, 2000)).astype(np.float32)
        cfg_b = ops.GridConfig(capacity=1 << 10, pts_per_voxel=8, resolution=1.0, probe=8, nearby=7, baked=True)
        g_b = ops.insert(cfg_b, ops.create(cfg_b), jnp.asarray(pts), jnp.ones(2000, bool))
        nbrs, d2, cnt, idx = ops.knn(cfg_b, g_b, jnp.asarray(pts[:, :100]), k=5, max_range=3.0)
        # dense cloud: every query still finds neighbors, d2 finite where counted
        assert np.all(np.asarray(cnt) >= 1)
        valid = np.arange(5)[:, None] < np.asarray(cnt)[None, :]
        assert np.all(np.isfinite(np.asarray(d2)[valid]))
