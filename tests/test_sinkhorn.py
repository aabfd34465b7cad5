"""Sinkhorn OT parity: padded/masked implementation vs an unpadded numpy
oracle of the reference math (reference: models/gmatcher.py:41-69)."""

import numpy as np
import jax.numpy as jnp

from gims_tpu.matcher.sinkhorn import (
    log_optimal_transport,
    extract_matches,
)


def np_log_sinkhorn(Z, log_mu, log_nu, iters):
    u = np.zeros_like(log_mu)
    v = np.zeros_like(log_nu)
    for _ in range(iters):
        u = log_mu - _lse(Z + v[None, :], axis=1)
        v = log_nu - _lse(Z + u[:, None], axis=0)
    return Z + u[:, None] + v[None, :]


def _lse(x, axis):
    m = x.max(axis=axis, keepdims=True)
    return (m + np.log(np.exp(x - m).sum(axis=axis, keepdims=True))).squeeze(axis)


def np_log_optimal_transport(scores, alpha, iters):
    m, n = scores.shape
    ms, ns = float(m), float(n)
    couplings = np.block([
        [scores, np.full((m, 1), alpha)],
        [np.full((1, n), alpha), np.full((1, 1), alpha)],
    ])
    norm = -np.log(ms + ns)
    log_mu = np.concatenate([np.full(m, norm), [np.log(ns) + norm]])
    log_nu = np.concatenate([np.full(n, norm), [np.log(ms) + norm]])
    Z = np_log_sinkhorn(couplings, log_mu, log_nu, iters)
    return Z - norm


def test_unpadded_matches_oracle(rng):
    m, n = 17, 23
    scores = rng.randn(m, n).astype(np.float32)
    alpha = 0.7
    for iters in (1, 5, 50):
        want = np_log_optimal_transport(scores, alpha, iters)
        got = log_optimal_transport(
            jnp.asarray(scores)[None], jnp.float32(alpha), iters,
            jnp.ones((1, m), bool), jnp.ones((1, n), bool),
        )[0]
        np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=2e-5)


def test_padded_matches_unpadded(rng):
    m, n = 13, 19
    mp, np_ = 32, 64  # padded sizes
    scores = rng.randn(m, n).astype(np.float32)
    alpha = 1.0
    want = np_log_optimal_transport(scores, alpha, 30)

    scores_p = np.zeros((mp, np_), np.float32)
    scores_p[:m, :n] = scores
    # garbage in padding must not leak
    scores_p[m:, :] = 123.0
    scores_p[:, n:] = -55.0
    row_mask = np.zeros((mp,), bool)
    row_mask[:m] = True
    col_mask = np.zeros((np_,), bool)
    col_mask[:n] = True

    got = log_optimal_transport(
        jnp.asarray(scores_p)[None], jnp.float32(alpha), 30,
        jnp.asarray(row_mask)[None], jnp.asarray(col_mask)[None],
    )[0]
    got = np.asarray(got)
    # valid block + dustbin row/col (at padded positions mp, np_)
    np.testing.assert_allclose(got[:m, :n], want[:m, :n], rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(got[:m, -1], want[:m, -1], rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(got[-1, :n], want[-1, :n], rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(got[-1, -1], want[-1, -1], rtol=2e-5, atol=2e-5)


def test_scattered_valid_mask(rng):
    """Valid entries need not be a prefix: arbitrary masks must also work."""
    mp, np_ = 16, 16
    keep_r = np.array([1, 3, 4, 9, 15])
    keep_c = np.array([0, 2, 5, 8, 9, 11])
    scores_full = rng.randn(mp, np_).astype(np.float32)
    sub = scores_full[np.ix_(keep_r, keep_c)]
    want = np_log_optimal_transport(sub, 0.3, 25)

    row_mask = np.zeros(mp, bool)
    row_mask[keep_r] = True
    col_mask = np.zeros(np_, bool)
    col_mask[keep_c] = True
    got = np.asarray(
        log_optimal_transport(
            jnp.asarray(scores_full)[None], jnp.float32(0.3), 25,
            jnp.asarray(row_mask)[None], jnp.asarray(col_mask)[None],
        )[0]
    )
    np.testing.assert_allclose(
        got[np.ix_(keep_r, keep_c)], want[:-1, :-1], rtol=2e-5, atol=2e-5
    )
    np.testing.assert_allclose(got[keep_r, -1], want[:-1, -1], rtol=2e-5, atol=2e-5)


def np_extract(Z, thr):
    """Oracle for mutual-NN extraction (reference: gmatcher.py:284-294)."""
    block = Z[:-1, :-1]
    m, n = block.shape
    idx0 = block.argmax(1)
    idx1 = block.argmax(0)
    max0 = block.max(1)
    mutual0 = np.arange(m) == idx1[idx0]
    mutual1 = np.arange(n) == idx0[idx1]
    ms0 = np.where(mutual0, np.exp(max0), 0.0)
    ms1 = np.where(mutual1, ms0[idx1], 0.0)
    valid0 = mutual0 & (ms0 > thr)
    valid1 = mutual1 & valid0[idx1]
    return (
        np.where(valid0, idx0, -1),
        np.where(valid1, idx1, -1),
        ms0,
        ms1,
    )


def test_extraction_matches_oracle(rng):
    m, n = 21, 17
    scores = rng.randn(m, n).astype(np.float32)
    Z = np_log_optimal_transport(scores, 0.5, 20)
    want0, want1, wms0, wms1 = np_extract(Z, 0.2)

    mp, np_ = 32, 32
    Zp = np.full((mp + 1, np_ + 1), -37.0, np.float32)
    Zp[:m, :n] = Z[:m, :n]
    Zp[:m, -1] = Z[:m, -1]
    Zp[-1, :n] = Z[-1, :n]
    row_mask = np.zeros(mp, bool)
    row_mask[:m] = True
    col_mask = np.zeros(np_, bool)
    col_mask[:n] = True
    out = extract_matches(
        jnp.asarray(Zp)[None], jnp.asarray(row_mask)[None],
        jnp.asarray(col_mask)[None], 0.2,
    )
    np.testing.assert_array_equal(np.asarray(out["matches0"][0][:m]), want0)
    np.testing.assert_array_equal(np.asarray(out["matches1"][0][:n]), want1)
    np.testing.assert_allclose(np.asarray(out["matching_scores0"][0][:m]), wms0, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out["matching_scores1"][0][:n]), wms1, rtol=1e-5)
    # padded slots are no-match
    assert (np.asarray(out["matches0"][0][m:]) == -1).all()
    assert (np.asarray(out["matching_scores0"][0][m:]) == 0).all()
