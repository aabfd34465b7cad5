"""Native C++ library tests: build, KNN matching vs numpy, RANSAC
homography filter vs a known model, FastMatCombi caching."""

import ctypes

import numpy as np
import pytest

from gims_tpu.native.bridge import CPPbridge, build_library


@pytest.fixture(scope="module")
def bridge():
    build_library()
    return CPPbridge()


def test_knn_matcher_vs_numpy(bridge, rng):
    nq, nt, d = 40, 50, 16
    qd = rng.randn(nq, d).astype(np.float32)
    td = rng.randn(nt, d).astype(np.float32)
    qk = rng.rand(nq, 2).astype(np.float32) * 100
    tk = rng.rand(nt, 2).astype(np.float32) * 100
    bridge.CreateMatcher(d, k=1, sim_thres=0.95)
    bridge.KnnMatch(qk, qd, tk, td)
    got = {(q, t) for q, t, _ in bridge.all_matches()}

    dist = np.linalg.norm(qd[:, None] - td[None], axis=-1)
    order = np.argsort(dist, axis=1)
    want = set()
    for q in range(nq):
        first = dist[q, order[q, 0]]
        second = dist[q, order[q, 1]]
        if first <= 0.95 * second:
            want.add((q, int(order[q, 0])))
    assert got == want


def test_geometric_filter_homography(bridge, rng):
    n = 200
    H = np.array([[1.1, 0.05, 10.0], [-0.04, 0.95, -5.0], [1e-4, -2e-5, 1.0]])
    src = rng.rand(n, 2) * 300
    ones = np.ones((n, 1))
    proj = np.concatenate([src, ones], 1) @ H.T
    dst = proj[:, :2] / proj[:, 2:3]
    # corrupt 30% with gross outliers
    n_out = 60
    dst[:n_out] = rng.rand(n_out, 2) * 300 + 400
    im = np.zeros((480, 640, 3), np.uint8)
    mask, T = bridge.GeometricFilter(
        src.reshape(-1).astype(np.float32), im,
        dst.reshape(-1).astype(np.float32), im, "ORSA_H", precision=3.0,
    )
    assert mask[n_out:].mean() > 0.95          # inliers found
    assert mask[:n_out].mean() < 0.05          # outliers rejected
    # recovered model maps src -> dst for inliers
    proj_T = np.concatenate([src, ones], 1) @ T.T
    proj_T = proj_T[:, :2] / proj_T[:, 2:3]
    err = np.linalg.norm(proj_T[n_out:] - dst[n_out:], axis=1)
    assert np.median(err) < 1.0


def test_geometric_filter_from_matcher(bridge, rng):
    n, d = 80, 8
    H = np.array([[1.0, 0.02, 5.0], [-0.01, 1.0, -3.0], [0, 0, 1.0]])
    qk = (rng.rand(n, 2) * 200).astype(np.float32)
    ones = np.ones((n, 1))
    proj = np.concatenate([qk, ones], 1) @ H.T
    tk = (proj[:, :2] / proj[:, 2:3]).astype(np.float32)
    desc = rng.randn(n, d).astype(np.float32)
    bridge.CreateMatcher(d, k=1, sim_thres=1.0)
    bridge.KnnMatch(qk, desc, tk, desc + rng.randn(n, d).astype(np.float32) * 0.01)
    matches, T = bridge.GeometricFilterFromMatcher(
        np.zeros((240, 320)), np.zeros((240, 320)), precision=3.0,
    )
    correct = sum(1 for q, t, _ in matches if q == t)
    assert correct > 0.8 * len(matches)
    assert len(matches) > 0.5 * n


def test_fastmatcombi_incremental(bridge, rng):
    n, m = 6, 32
    ps1 = rng.rand(n, m).astype(np.float32)
    ps2 = rng.rand(n, m).astype(np.float32)
    bP = np.zeros((n, n), np.float32)
    i_list = np.arange(n, dtype=np.int32)
    j_list = np.arange(n, dtype=np.int32)
    bridge.PrepareForFastMatCombi(n)
    bridge.FastMatCombi(bP, i_list, ps1, j_list, ps2, m)
    want = np.linalg.norm(ps1[:, None] - ps2[None], axis=-1)
    np.testing.assert_allclose(bP, want, rtol=1e-5, atol=1e-6)
    # unchanged index lists -> cached values survive even if buffers change
    bP2 = bP.copy()
    bridge.FastMatCombi(bP2, i_list, ps1 * 0, j_list, ps2 * 0, m)
    np.testing.assert_allclose(bP2, bP)
