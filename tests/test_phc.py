"""Hilbert curve + PHC merge/sort (ops/phc.py).

Parity targets: hilbert.hpp PositionToIndex/IndexToPosition invariants and
IVoxNodePhc centroid-merge semantics (ivox3d_node.hpp), validated by the
curve's defining properties rather than C++ call-for-call."""

import numpy as np
import jax.numpy as jnp

from pointcloud_slam_tpu.ops import phc


def _full_cube(order):
    n = 1 << order
    g = np.mgrid[0:n, 0:n, 0:n].reshape(3, -1).astype(np.uint32)
    return g


def test_hilbert_bijective():
    for order in (1, 2, 3):
        g = _full_cube(order)
        h = np.asarray(phc.hilbert_index(jnp.asarray(g), order))
        assert sorted(h.tolist()) == list(range(8 ** order)), f"order {order} not bijective"


def test_hilbert_adjacency():
    # consecutive curve indices are unit steps along exactly one axis — the
    # defining locality property of a Hilbert curve (hilbert.hpp's contract)
    for order in (1, 2, 3):
        g = _full_cube(order)
        h = np.asarray(phc.hilbert_index(jnp.asarray(g), order))
        pos = np.empty((8 ** order, 3), np.int64)
        pos[h] = g.T
        step = np.abs(np.diff(pos, axis=0))
        assert np.all(step.sum(axis=1) == 1), f"order {order} breaks adjacency"


def test_hilbert_inverse_roundtrip():
    for order in (2, 4, 7):
        rng = np.random.default_rng(order)
        g = rng.integers(0, 1 << order, size=(3, 500)).astype(np.uint32)
        h = phc.hilbert_index(jnp.asarray(g), order)
        back = np.asarray(phc.hilbert_coords(h, order))
        np.testing.assert_array_equal(back, g)
        # and index(coords(h)) == h over a random index set
        hs = rng.integers(0, 8 ** order, size=300).astype(np.uint32)
        c = phc.hilbert_coords(jnp.asarray(hs), order)
        np.testing.assert_array_equal(np.asarray(phc.hilbert_index(c, order)), hs)


def test_hilbert_nested_prefix():
    # self-similarity: the order-k index's top 3 bits are the order-1 index of
    # the point's octant — guarantees curve-order locality across scales
    order = 4
    rng = np.random.default_rng(0)
    g = rng.integers(0, 1 << order, size=(3, 1000)).astype(np.uint32)
    h = np.asarray(phc.hilbert_index(jnp.asarray(g), order))
    oct_coords = (g >> (order - 1)).astype(np.uint32)
    h1 = np.asarray(phc.hilbert_index(jnp.asarray(oct_coords), 1))
    np.testing.assert_array_equal(h >> (3 * (order - 1)), h1)


def test_phc_merge_centroids():
    res, order = 1.0, 2  # sub-cube edge 0.25
    pts = np.array(
        [
            [0.10, 0.10, 0.10],   # cell A
            [0.20, 0.15, 0.05],   # cell A (same sub-cube) -> merged
            [0.60, 0.60, 0.60],   # cell B
            [0.10, 0.10, 0.10],   # masked out
            [1.30, 0.10, 0.10],   # cell C (different voxel)
        ],
        np.float32,
    ).T
    mask = np.array([True, True, True, False, True])
    out, om = phc.phc_merge(jnp.asarray(pts), jnp.asarray(mask), res, order)
    out, om = np.asarray(out), np.asarray(om)
    assert om.sum() == 3
    got = sorted(out[:, om].T.tolist())
    want = sorted(
        [
            [0.15, 0.125, 0.075],  # centroid of the two cell-A points
            [0.60, 0.60, 0.60],
            [1.30, 0.10, 0.10],
        ]
    )
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_phc_merge_bounds_density():
    # many points in one voxel collapse to at most 8^order survivors
    rng = np.random.default_rng(1)
    pts = rng.uniform(0, 1, size=(3, 4000)).astype(np.float32)  # one voxel at res=1
    mask = np.ones(4000, bool)
    _, om = phc.phc_merge(jnp.asarray(pts), jnp.asarray(mask), 1.0, 2)
    assert 0 < int(np.asarray(om).sum()) <= 64


def test_phc_sort_curve_order():
    rng = np.random.default_rng(2)
    pts = rng.uniform(-2, 2, size=(3, 512)).astype(np.float32)
    mask = rng.random(512) < 0.9
    sp, sm = phc.phc_sort(jnp.asarray(pts), jnp.asarray(mask), 1.0, 3)
    sp, sm = np.asarray(sp), np.asarray(sm)
    # permutation of the input (masked columns last)
    n_valid = mask.sum()
    assert sm[:n_valid].all() and not sm[n_valid:].any()
    got = sorted(map(tuple, sp.T.tolist()))
    want = sorted(map(tuple, pts.T.tolist()))
    assert got == want
    # within each voxel, points appear in non-decreasing Hilbert order
    vox = np.floor(sp[:, :n_valid]).astype(np.int64)
    sub = np.clip(((sp[:, :n_valid] - vox) * 8).astype(np.int64), 0, 7).astype(np.uint32)
    h = np.asarray(phc.hilbert_index(jnp.asarray(sub), 3))
    for i in range(1, n_valid):
        if (vox[:, i] == vox[:, i - 1]).all():
            assert h[i] >= h[i - 1]


def test_phc_merge_curve_output():
    rng = np.random.default_rng(3)
    pts = rng.uniform(-2, 2, size=(3, 600)).astype(np.float32)
    mask = rng.random(600) < 0.85
    out_s, om_s = phc.phc_merge(jnp.asarray(pts), jnp.asarray(mask), 1.0, 2)
    out_c, om_c = phc.phc_merge(jnp.asarray(pts), jnp.asarray(mask), 1.0, 2, curve_output=True)
    out_s, om_s, out_c, om_c = map(np.asarray, (out_s, om_s, out_c, om_c))
    # packed: same centroid multiset, mask a contiguous prefix
    n = om_s.sum()
    assert om_c.sum() == n
    assert om_c[:n].all() and not om_c[n:].any()
    got = sorted(map(tuple, np.round(out_c[:, :n].T, 5).tolist()))
    want = sorted(map(tuple, np.round(out_s[:, om_s].T, 5).tolist()))
    assert got == want
    # packed output is in (voxel, hilbert) curve order: voxel keys lexsorted
    vox = np.floor(out_c[:, :n]).astype(np.int64)
    keys = list(map(tuple, vox.T.tolist()))
    assert keys == sorted(keys)


def test_phc_insert_roundtrip():
    # merged curve-ordered batch drives the voxel map exactly like a raw batch
    from pointcloud_slam_tpu import ops

    rng = np.random.default_rng(4)
    pts = rng.uniform(0, 4, size=(3, 800)).astype(np.float32)
    mask = np.ones(800, bool)
    cfg = ops.GridConfig(capacity=1 << 10, pts_per_voxel=8, resolution=1.0, nearby=7)
    merged, mm = ops.phc_merge(jnp.asarray(pts), jnp.asarray(mask), cfg.resolution, 1, curve_output=True)
    grid = ops.insert(cfg, ops.create(cfg), merged, mm)
    q = jnp.asarray(pts[:, :64])
    nbrs, d2, cnt, _ = ops.knn(cfg, grid, q, k=1, max_range=2.0)
    # every query has a merged neighbor within the sub-cube diagonal (res/2 * sqrt(3))
    assert int(np.asarray(cnt).min()) >= 1
    assert float(np.asarray(d2[0]).max()) <= 3.0 * 0.25 + 1e-5
