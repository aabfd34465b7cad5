"""AGC parity: dense masked TPU implementation vs a networkx/scipy oracle
that follows the reference pipeline semantics (reference: models/agc.py
682-709, 413-449, 476-565)."""

import numpy as np
import networkx as nx
import pytest
import jax.numpy as jnp
from scipy.spatial import cKDTree
from scipy.sparse import csr_matrix
from scipy.sparse.csgraph import connected_components as scipy_cc

from gims_tpu.agc.graph import (
    build_graph,
    connected_components,
    kth_smallest_masked,
    delaunay_adjacency_host,
)


def oracle_agc(kpts, descs, radius, percentile, min_size):
    """Oracle following the reference's algorithm with networkx/scipy."""
    n = len(kpts)
    tree = cKDTree(kpts)
    pairs = tree.query_pairs(r=radius)
    normed = descs / np.maximum(
        np.linalg.norm(descs, axis=1, keepdims=True), 1e-12
    )
    sim = (normed @ normed.T).astype(np.float32)
    vals = sim[np.triu_indices(n, 1)]
    k = int(len(vals) * percentile / 100)
    if k >= len(vals):
        k = len(vals) - 1
    thr = np.partition(vals, k)[k]

    g = nx.Graph()
    g.add_nodes_from(range(n))
    for i, j in pairs:
        if sim[i, j] >= thr:
            g.add_edge(i, j)

    if g.number_of_edges() > 0:
        for node in list(g.nodes):
            if g.degree(node) == 0:
                _, nnidx = tree.query(kpts[node], k=2)
                nn = nnidx[1] if nnidx[0] == node else nnidx[0]
                g.add_edge(node, nn)

    kept = set()
    for comp in list(nx.connected_components(g)):
        if len(comp) < min_size:
            g.remove_nodes_from(comp)
        else:
            kept |= comp

    comps = list(nx.connected_components(g))
    if len(comps) > 1:
        cents = np.array([kpts[list(c)].mean(0) for c in comps])
        ctree = cKDTree(cents)
        _, nn_idx = ctree.query(cents, k=2)
        connected = set()
        for i, j in enumerate(nn_idx[:, 1]):
            if (i, j) in connected or (j, i) in connected:
                continue
            connected.add((i, j))
            ci, cj = list(comps[i]), list(comps[j])
            ti = cKDTree(kpts[ci])
            dists, indices = ti.query(kpts[cj], k=1)
            jj = int(np.argmin(dists))
            ii = int(indices[jj])
            g.add_edge(ci[ii], cj[jj])
    return g, kept, thr


def run_both(kpts, descs, radius, percentile, min_size, pad_to=None, **kw):
    n = len(kpts)
    nb = pad_to or n
    kp = np.full((nb, 2), 1e6, np.float32)
    kp[:n] = kpts
    dp = np.zeros((nb, descs.shape[1]), np.float32)
    dp[:n] = descs
    valid = np.zeros(nb, bool)
    valid[:n] = True
    out = build_graph(
        jnp.asarray(kp), jnp.asarray(dp), jnp.asarray(valid),
        radius=radius, percentile=percentile, min_size=min_size, **kw,
    )
    g, kept, thr = oracle_agc(kpts, descs, radius, percentile, min_size)
    return out, g, kept, thr, n


def assert_parity(out, g, kept, thr, n):
    got_kept = set(np.nonzero(np.asarray(out.kept))[0].tolist())
    assert got_kept == kept
    adj = np.asarray(out.adj)
    got_edges = {
        (int(i), int(j)) for i, j in zip(*np.nonzero(adj)) if i < j
    }
    want_edges = {(min(u, v), max(u, v)) for u, v in g.edges}
    assert got_edges == want_edges
    np.testing.assert_allclose(float(out.threshold), thr, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("pad", [None, 300])
def test_agc_parity_random(seed, pad):
    rng = np.random.RandomState(seed)
    n = 180
    kpts = (rng.rand(n, 2) * 200).astype(np.float32)
    descs = rng.randn(n, 16).astype(np.float32)
    out, g, kept, thr, n = run_both(kpts, descs, 25.0, 7.0, 5, pad_to=pad)
    assert_parity(out, g, kept, thr, n)


def test_agc_parity_eval_knobs():
    rng = np.random.RandomState(7)
    n = 256
    kpts = (rng.rand(n, 2) * 120).astype(np.float32)
    descs = rng.randn(n, 32).astype(np.float32)
    out, g, kept, thr, n = run_both(kpts, descs, 15.0, 2.0, 7, pad_to=512)
    assert_parity(out, g, kept, thr, n)


def test_agc_clustered_many_components():
    """Clusters far apart force the small-component removal + reconnection."""
    rng = np.random.RandomState(42)
    clusters = []
    for cx, cy, cnt in [(0, 0, 30), (500, 0, 25), (0, 500, 12),
                        (500, 500, 4), (250, 250, 3)]:
        clusters.append(rng.rand(cnt, 2).astype(np.float32) * 30 + [cx, cy])
    kpts = np.concatenate(clusters)
    descs = rng.randn(len(kpts), 8).astype(np.float32)
    out, g, kept, thr, n = run_both(kpts, descs, 40.0, 5.0, 6, pad_to=128)
    assert_parity(out, g, kept, thr, n)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_agc_sparse_cc_parity_random(seed):
    """cc_impl='sparse' (fixed-degree neighbor-list CC) matches the oracle
    end-to-end whenever true degrees stay under cc_degree."""
    rng = np.random.RandomState(seed)
    n = 180
    kpts = (rng.rand(n, 2) * 200).astype(np.float32)
    descs = rng.randn(n, 16).astype(np.float32)
    out, g, kept, thr, n = run_both(kpts, descs, 25.0, 7.0, 5, pad_to=300,
                                    cc_impl="sparse", cc_degree=48)
    assert_parity(out, g, kept, thr, n)


def test_agc_sparse_cc_parity_eval_knobs():
    rng = np.random.RandomState(7)
    n = 256
    kpts = (rng.rand(n, 2) * 120).astype(np.float32)
    descs = rng.randn(n, 32).astype(np.float32)
    out, g, kept, thr, n = run_both(kpts, descs, 15.0, 2.0, 7, pad_to=512,
                                    cc_impl="sparse", cc_degree=64)
    assert_parity(out, g, kept, thr, n)


def test_agc_sparse_push_covers_overflow():
    """A hub whose degree exceeds cc_degree stays in one component: the
    push direction carries edges the overflowing endpoint dropped."""
    # star graph: hub at origin, 40 spokes within radius; cc_degree=8
    n = 41
    kpts = np.zeros((n, 2), np.float32)
    ang = np.linspace(0, 2 * np.pi, n - 1, endpoint=False)
    kpts[1:, 0] = 10 * np.cos(ang)
    kpts[1:, 1] = 10 * np.sin(ang)
    # identical descriptors -> all similarities 1.0, everything passes
    descs = np.ones((n, 4), np.float32)
    out = build_graph(
        jnp.asarray(kpts), jnp.asarray(np.asarray(descs)),
        jnp.ones(n, bool), radius=11.0, percentile=2.0, min_size=2,
        cc_impl="sparse", cc_degree=8,
    )
    labels = np.asarray(out.labels)
    assert (labels == labels[0]).all()
    assert np.asarray(out.kept).all()


def test_agc_centroid_reconnect_same_topology():
    """reconnect_impl='centroid' links the same COMPONENT pairs as the
    exact variant (only the carrying node pair may differ)."""
    rng = np.random.RandomState(42)
    clusters = []
    for cx, cy, cnt in [(0, 0, 30), (500, 0, 25), (0, 500, 12),
                        (500, 500, 9), (250, 250, 8)]:
        clusters.append(rng.rand(cnt, 2).astype(np.float32) * 30 + [cx, cy])
    kpts = np.concatenate(clusters)
    descs = rng.randn(len(kpts), 8).astype(np.float32)
    n = len(kpts)

    def comps_of(out):
        adj = np.asarray(out.adj)[:n, :n]
        kept = np.asarray(out.kept)[:n]
        gg = nx.Graph()
        gg.add_nodes_from(np.nonzero(kept)[0].tolist())
        for i, j in zip(*np.nonzero(adj)):
            if i < j:
                gg.add_edge(int(i), int(j))
        return sorted(frozenset(c) for c in nx.connected_components(gg))

    exact, _, _, _, _ = run_both(kpts, descs, 40.0, 5.0, 6, pad_to=128)
    cent, _, _, _, _ = run_both(kpts, descs, 40.0, 5.0, 6, pad_to=128,
                                cc_impl="sparse", cc_degree=64,
                                reconnect_impl="centroid",
                                reconnect_buckets=64)
    np.testing.assert_array_equal(np.asarray(exact.kept),
                                  np.asarray(cent.kept))
    assert comps_of(exact) == comps_of(cent)
    # the centroid variant still connects every surviving component
    assert len(comps_of(cent)) == 1


def test_connected_components_sparse_vs_scipy(rng):
    from gims_tpu.agc.graph import connected_components_sparse, neighbor_list

    n = 200
    adj = rng.rand(n, n) < 0.03
    adj = np.triu(adj, 1)
    adj = adj | adj.T
    np.fill_diagonal(adj, False)
    kpts = (rng.rand(n, 2) * 100).astype(np.float32)
    d = kpts[:, None, :] - kpts[None, :, :]
    d2 = jnp.asarray((d * d).sum(-1))
    valid = np.ones(n, bool)
    pv_od = jnp.asarray(~np.eye(n, dtype=bool))
    nbr_idx, nbr_ok, _ = neighbor_list(d2, jnp.asarray(adj), pv_od, 32)
    # cap can drop edges for hubs; scipy oracle must see the same edge set
    kept_edges = np.zeros((n, n), bool)
    ni = np.asarray(nbr_idx)
    no = np.asarray(nbr_ok)
    for i in range(n):
        kept_edges[i, ni[i][no[i]]] = True
    kept_edges = kept_edges | kept_edges.T
    labels = np.asarray(connected_components_sparse(
        nbr_idx, nbr_ok, jnp.asarray(valid), rounds=20))
    ncomp, scipy_labels = scipy_cc(csr_matrix(kept_edges), directed=False)
    # same partition: min node id per scipy component == our label
    for c in range(ncomp):
        members = np.nonzero(scipy_labels == c)[0]
        assert (labels[members] == members.min()).all()


def test_connected_components_path_graph():
    """Worst-case diameter: a path graph must converge in cc_rounds."""
    n = 512
    adj = np.zeros((n, n), bool)
    for i in range(n - 1):
        adj[i, i + 1] = adj[i + 1, i] = True
    labels = np.asarray(
        connected_components(jnp.asarray(adj), jnp.ones(n, bool), rounds=20)
    )
    assert (labels == 0).all()


def test_connected_components_random_vs_scipy(rng):
    n = 200
    adj = rng.rand(n, n) < 0.01
    adj = np.triu(adj, 1)
    adj = adj | adj.T
    valid = rng.rand(n) < 0.9
    adj = adj & valid[:, None] & valid[None, :]
    labels = np.asarray(
        connected_components(jnp.asarray(adj), jnp.asarray(valid), rounds=20)
    )
    ncomp, want = scipy_cc(csr_matrix(adj[np.ix_(valid, valid)]), directed=False)
    got_valid = labels[valid]
    # same partition: two valid nodes share our label iff scipy agrees
    same_ours = got_valid[:, None] == got_valid[None, :]
    same_want = want[:, None] == want[None, :]
    assert (same_ours == same_want).all()
    # label is the min node id of the component
    ids = np.nonzero(valid)[0]
    for lab in np.unique(got_valid):
        members = ids[got_valid == lab]
        assert lab == members.min()
    assert (labels[~valid] == n).all()


@pytest.mark.parametrize("percentile", [0.0, 2.0, 7.0, 50.0, 99.0])
def test_kth_smallest_exact(rng, percentile):
    vals = rng.randn(4000).astype(np.float32)
    vals = np.clip(vals, -0.999, 0.999)
    mask = rng.rand(4000) < 0.8
    subset = np.sort(vals[mask])
    k = int(len(subset) * percentile / 100)
    k = min(k, len(subset) - 1)
    got = float(
        kth_smallest_masked(
            jnp.asarray(vals), jnp.asarray(mask), jnp.int32(k),
            lo=-1.001, hi=1.001,
        )
    )
    assert got == subset[k]


def test_threshold_approx_close_to_exact():
    """threshold_impl='approx' (strided row subsample) must land within a
    tight percentile band of the exact threshold: the rank error of a
    subsample of m pairs is O(sqrt(m)), i.e. a tiny percentile shift."""
    rng = np.random.RandomState(3)
    n = 512
    kpts = (rng.rand(n, 2) * 300).astype(np.float32)
    descs = rng.randn(n, 32).astype(np.float32)
    valid = np.ones(n, bool)
    args = (jnp.asarray(kpts), jnp.asarray(descs), jnp.asarray(valid))
    exact = build_graph(*args, radius=25.0, percentile=7.0, min_size=5)
    approx = build_graph(*args, radius=25.0, percentile=7.0, min_size=5,
                         threshold_impl="approx", threshold_stride=4)
    # percentile rank of the approx threshold within the full valid set
    normed = descs / np.maximum(
        np.linalg.norm(descs, axis=1, keepdims=True), 1e-12)
    sim = normed @ normed.T
    triu = np.triu_indices(n, k=1)
    vals = np.sort(sim[triu])
    r_exact = np.searchsorted(vals, float(exact.threshold)) / len(vals)
    r_approx = np.searchsorted(vals, float(approx.threshold)) / len(vals)
    assert abs(r_exact - 0.07) < 1e-3
    assert abs(r_approx - r_exact) < 0.01  # sub-percent rank error
    # the resulting graphs should be nearly identical
    e_adj = np.asarray(exact.adj)
    a_adj = np.asarray(approx.adj)
    agree = (e_adj == a_adj).mean()
    assert agree > 0.999


def test_delaunay_adjacency():
    rng = np.random.RandomState(1)
    n, nb = 50, 64
    kpts = rng.rand(n, 2).astype(np.float32) * 100
    valid = np.zeros(nb, bool)
    valid[:n] = True
    kp = np.zeros((nb, 2), np.float32)
    kp[:n] = kpts
    adj = delaunay_adjacency_host(kp, valid)
    from scipy.spatial import Delaunay

    tri = Delaunay(kpts)
    want = set()
    for s in tri.simplices:
        for a in range(3):
            for b in range(a + 1, 3):
                want.add((min(s[a], s[b]), max(s[a], s[b])))
    got = {(int(i), int(j)) for i, j in zip(*np.nonzero(adj)) if i < j}
    assert got == want


def run_band(kpts, descs, radius, percentile, min_size, pad_to=None, **kw):
    from gims_tpu.agc.graph import build_graph_band

    n = len(kpts)
    nb = pad_to or n
    kp = np.full((nb, 2), 1e6, np.float32)
    dp = np.zeros((nb, descs.shape[1]), np.float32)
    kp[:n] = kpts
    dp[:n] = descs
    valid = np.zeros(nb, bool)
    valid[:n] = True
    return build_graph_band(
        jnp.asarray(kp), jnp.asarray(dp), jnp.asarray(valid),
        radius=radius, percentile=percentile, min_size=min_size, **kw,
    )


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("pad", [None, 300])
def test_agc_band_parity_random(seed, pad):
    """Full-coverage band (halfwidth >= N, stride 1, exact reconnect)
    reproduces the oracle exactly — including the un-permute back to the
    caller's keypoint order."""
    rng = np.random.RandomState(seed)
    n = 180
    kpts = (rng.rand(n, 2) * 200).astype(np.float32)
    descs = rng.randn(n, 16).astype(np.float32)
    out = run_band(kpts, descs, 25.0, 7.0, 5, pad_to=pad,
                   threshold_stride=1, band_halfwidth=512,
                   reconnect_impl="exact", reconnect_buckets=4096)
    g, kept, thr = oracle_agc(kpts, descs, 25.0, 7.0, 5)
    assert_parity(out, g, kept, thr, n)


def test_agc_band_parity_eval_knobs():
    rng = np.random.RandomState(7)
    n = 256
    kpts = (rng.rand(n, 2) * 120).astype(np.float32)
    descs = rng.randn(n, 32).astype(np.float32)
    out = run_band(kpts, descs, 15.0, 2.0, 7, pad_to=512,
                   threshold_stride=1, band_halfwidth=1024,
                   reconnect_impl="exact", reconnect_buckets=4096)
    g, kept, thr = oracle_agc(kpts, descs, 15.0, 2.0, 7)
    assert_parity(out, g, kept, thr, n)


def test_agc_band_window_covers_radius_pairs():
    """With a NARROW window, band mode still equals the full-coverage band
    whenever no radius-pair exceeds the window — the operating regime; the
    x-sort guarantee is checked explicitly."""
    rng = np.random.RandomState(3)
    n = 600
    # spread across x so the x-sorted window covers every radius pair
    kpts = np.stack([
        rng.rand(n).astype(np.float32) * 4000,
        rng.rand(n).astype(np.float32) * 200,
    ], axis=1)
    descs = rng.randn(n, 16).astype(np.float32)
    radius = 25.0
    order = np.argsort(kpts[:, 0], kind="stable")
    xs = kpts[order, 0]
    # max sorted-index gap among radius pairs
    max_gap = 0
    for i in range(n):
        j = np.searchsorted(xs, xs[i] + radius, side="right")
        max_gap = max(max_gap, j - i - 1)
    assert max_gap < 128, "test setup: window must cover all pairs"
    wide = run_band(kpts, descs, radius, 5.0, 5, pad_to=640,
                    threshold_stride=1, band_halfwidth=640,
                    reconnect_impl="exact", reconnect_buckets=4096)
    narrow = run_band(kpts, descs, radius, 5.0, 5, pad_to=640,
                      threshold_stride=1, band_halfwidth=128,
                      reconnect_impl="exact", reconnect_buckets=4096)
    np.testing.assert_array_equal(np.asarray(wide.kept),
                                  np.asarray(narrow.kept))
    np.testing.assert_array_equal(np.asarray(wide.adj),
                                  np.asarray(narrow.adj))


def test_agc_band_strided_threshold_matches_dense_approx():
    """threshold_impl parity on UNSORTED input: the band threshold
    subsample is taken in the caller's row order before the x-sort, so it
    is bit-identical to dense-approx regardless of input order."""
    rng = np.random.RandomState(11)
    n = 256
    kpts = (rng.rand(n, 2) * 300).astype(np.float32)
    descs = rng.randn(n, 24).astype(np.float32)
    dense = build_graph(
        jnp.asarray(kpts), jnp.asarray(descs), jnp.ones(n, bool),
        radius=20.0, percentile=4.0, min_size=5,
        threshold_impl="approx", threshold_stride=4,
    )
    band = run_band(kpts, descs, 20.0, 4.0, 5,
                    threshold_stride=4, band_halfwidth=512,
                    reconnect_impl="exact", reconnect_buckets=4096)
    np.testing.assert_allclose(float(band.threshold),
                               float(dense.threshold), rtol=0, atol=0)
    # CANDIDATE edges (within radius) may differ only on pairs whose
    # similarity sits within float rounding of the threshold — the
    # threshold-defining pair itself sits EXACTLY at it, and band sim
    # comes from blocked einsums while dense uses one (N, N) matmul, so
    # accumulation order can move such a dot product by an ulp. A flipped
    # candidate edge can then cascade into different isolation-fix /
    # reconnect LINK edges (d2 > radius^2); both effects must stay tiny.
    da = np.asarray(dense.adj)
    ba = np.asarray(band.adj)
    if not np.array_equal(da, ba):
        normed = descs / np.maximum(
            np.linalg.norm(descs, axis=1, keepdims=True), 1e-12)
        sim = (normed @ normed.T).astype(np.float32)
        dd = kpts[:, None, :] - kpts[None, :, :]
        d2 = (dd * dd).sum(-1)
        thr = float(dense.threshold)
        mism = np.argwhere(da != ba)
        cand = d2[mism[:, 0], mism[:, 1]] <= 20.0 * 20.0
        if cand.any():
            delta = np.abs(sim[mism[cand, 0], mism[cand, 1]] - thr)
            assert delta.max() < 1e-5
        assert len(mism) <= 16  # straddlers + their cascade links


def test_connected_components_band_vs_dense(rng):
    """Band CC (fwd pull + sheared bwd pull) equals dense CC on the
    symmetrized adjacency of the same forward band."""
    from gims_tpu.agc.graph import (_band_to_dense,
                                    connected_components_band)

    n, wh = 256, 64
    band = np.asarray(rng.rand(n, wh) < 0.02)
    j = np.arange(n)[:, None] + 1 + np.arange(wh)[None, :]
    band &= j < n
    valid = np.asarray(rng.rand(n) < 0.9)
    band &= valid[:, None]
    band &= np.take(np.concatenate([valid, np.zeros(wh + 1, bool)]),
                    np.minimum(j, n + wh))
    half = np.asarray(_band_to_dense(jnp.asarray(band)))
    adj = half | half.T
    want = np.asarray(connected_components(
        jnp.asarray(adj), jnp.asarray(valid), rounds=20))
    got = np.asarray(connected_components_band(
        jnp.asarray(band), jnp.asarray(valid), rounds=20, br=128))
    np.testing.assert_array_equal(got, want)


def test_build_graph_band_cc_impl_band_identical():
    """build_graph_band(cc_impl='band') returns the same graph as the
    default dense-CC arena — the labels are the same min-id fixpoint, so
    kept masks, adjacency, and labels must be bit-identical."""
    rng = np.random.RandomState(11)
    n = 220
    kpts = (rng.rand(n, 2) * 150).astype(np.float32)
    descs = rng.randn(n, 16).astype(np.float32)
    a = run_band(kpts, descs, 20.0, 5.0, 6, pad_to=256,
                 band_halfwidth=128, reconnect_impl="centroid")
    b = run_band(kpts, descs, 20.0, 5.0, 6, pad_to=256,
                 band_halfwidth=128, reconnect_impl="centroid",
                 cc_impl="band")
    np.testing.assert_array_equal(np.asarray(a.kept), np.asarray(b.kept))
    np.testing.assert_array_equal(np.asarray(a.adj), np.asarray(b.adj))
    np.testing.assert_array_equal(np.asarray(a.labels),
                                  np.asarray(b.labels))


def test_band_coverage_detects_dense_slab():
    """The band build's density bound (AGCConfig): a vertical slab holding
    more keypoints than band_halfwidth makes radius pairs fall outside the
    sorted-x window. band_coverage must flag it (coverage < 1), the narrow
    band build must actually lose those candidate edges, and a window
    covering N must restore coverage = 1 and dense parity."""
    from gims_tpu.agc.graph import band_coverage, build_graph

    rng = np.random.RandomState(5)
    n = 800
    # every point inside one radius-wide x-slab: all n points share the
    # window, so hw=128 << n drops most radius pairs
    kpts = np.stack([
        rng.rand(n).astype(np.float32) * 20.0,
        rng.rand(n).astype(np.float32) * 600.0,
    ], axis=1)
    descs = rng.randn(n, 16).astype(np.float32)
    valid = np.ones(n, bool)
    radius = 15.0

    cov_narrow = band_coverage(jnp.asarray(kpts), jnp.asarray(valid),
                               radius, 128)
    assert cov_narrow["pairs_in_radius"] > 0
    assert cov_narrow["coverage"] < 0.9  # the slab overwhelms hw=128
    cov_wide = band_coverage(jnp.asarray(kpts), jnp.asarray(valid),
                             radius, n - 1)
    assert cov_wide["coverage"] == 1.0
    assert cov_wide["pairs_outside_window"] == 0

    dense = build_graph(
        jnp.asarray(kpts), jnp.asarray(descs), jnp.asarray(valid),
        radius=radius, percentile=5.0, min_size=5,
        threshold_impl="approx", threshold_stride=1,
    )
    narrow = run_band(kpts, descs, radius, 5.0, 5,
                      threshold_stride=1, band_halfwidth=128,
                      reconnect_impl="exact", reconnect_buckets=4096)
    wide = run_band(kpts, descs, radius, 5.0, 5,
                    threshold_stride=1, band_halfwidth=n,
                    reconnect_impl="exact", reconnect_buckets=4096)
    # full-coverage band == dense; the clipped window loses real edges
    np.testing.assert_array_equal(np.asarray(wide.adj),
                                  np.asarray(dense.adj))
    n_wide = int(np.asarray(wide.adj).sum())
    n_narrow = int(np.asarray(narrow.adj).sum())
    assert n_narrow < n_wide, (
        "hw=128 must lose edges on a dense slab (density bound)")


def test_band_coverage_clustered_photo_density():
    """Photo-statistics x-density (heavy clusters, not uniform): at the
    shipped default (6144-kpt budget, radius 15, hw 512) a mixture of
    tight clusters over 800x600 must stay fully covered — clusters are
    2-D, so a radius-wide x-slab holds far fewer points than the window.
    Guards the TPU default against silently dropping radius pairs."""
    from gims_tpu.agc.graph import band_coverage

    rng = np.random.RandomState(11)
    n = 6144
    centers = rng.rand(24, 2) * np.array([800.0, 600.0])
    which = rng.randint(0, 24, n)
    kpts = (centers[which]
            + rng.randn(n, 2) * 18.0).astype(np.float32)
    kpts[:, 0] = np.clip(kpts[:, 0], 0, 800)
    kpts[:, 1] = np.clip(kpts[:, 1], 0, 600)
    cov = band_coverage(jnp.asarray(kpts), jnp.asarray(np.ones(n, bool)),
                        15.0, 512)
    assert cov["pairs_in_radius"] > 100000  # clusters are genuinely dense
    assert cov["coverage"] == 1.0


@pytest.mark.parametrize("reconnect", ["exact", "centroid"])
def test_band_defer_unpermute_composes(reconnect):
    """defer_unpermute returns the sorted-space adjacency + inv such that
    composing inv reproduces the caller-order matrix bit-exactly —
    including the reconnect link edges scattered through inv."""
    from gims_tpu.agc.graph import build_graph_band

    rng = np.random.RandomState(9)
    n = 300  # pads internally to 384 (128-multiple), so inv covers pads
    kpts = (rng.rand(n, 2) * 250).astype(np.float32)
    descs = rng.randn(n, 16).astype(np.float32)
    valid = np.ones(n, bool)
    valid[rng.choice(n, 20, replace=False)] = False
    kw = dict(radius=20.0, percentile=5.0, min_size=5,
              threshold_stride=2, band_halfwidth=512,
              reconnect_impl=reconnect, reconnect_buckets=4096)
    plain = build_graph_band(jnp.asarray(kpts), jnp.asarray(descs),
                             jnp.asarray(valid), **kw)
    deferred = build_graph_band(jnp.asarray(kpts), jnp.asarray(descs),
                                jnp.asarray(valid), defer_unpermute=True,
                                **kw)
    assert deferred.inv is not None
    inv = np.asarray(deferred.inv)
    adj_s = np.asarray(deferred.adj)
    composed = adj_s[inv][:, inv]
    np.testing.assert_array_equal(composed, np.asarray(plain.adj))
    np.testing.assert_array_equal(np.asarray(deferred.kept),
                                  np.asarray(plain.kept))
    np.testing.assert_array_equal(np.asarray(deferred.labels),
                                  np.asarray(plain.labels))
