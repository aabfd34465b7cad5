"""Pallas Sinkhorn kernel vs the XLA implementation (interpret mode on CPU)."""

import numpy as np
import pytest
import jax.numpy as jnp

from gims_tpu.matcher import sinkhorn
from gims_tpu.matcher.pallas_sinkhorn import log_optimal_transport_pallas


@pytest.mark.parametrize("m,n", [(100, 80), (256, 255)])
def test_pallas_matches_xla(rng, m, n):
    mp = ((m + 63) // 64) * 64
    np_ = ((n + 63) // 64) * 64
    scores = np.zeros((1, mp, np_), np.float32)
    scores[0, :m, :n] = rng.randn(m, n)
    row_mask = np.zeros((1, mp), bool)
    row_mask[0, :m] = True
    col_mask = np.zeros((1, np_), bool)
    col_mask[0, :n] = True

    want = sinkhorn.log_optimal_transport(
        jnp.asarray(scores), jnp.float32(0.8), 15,
        jnp.asarray(row_mask), jnp.asarray(col_mask),
    )
    got = log_optimal_transport_pallas(
        jnp.asarray(scores), jnp.float32(0.8), 15,
        jnp.asarray(row_mask), jnp.asarray(col_mask), interpret=True,
    )
    want = np.asarray(want)[0]
    got = np.asarray(got)[0]
    sel = np.ix_(
        list(range(m)) + [mp], list(range(n)) + [np_]
    )
    np.testing.assert_allclose(got[sel], want[sel], rtol=2e-4, atol=2e-4)


def test_pallas_batched(rng):
    """B > 1: the batch axis is the kernel grid (each step DMAs its own
    pair). Ragged valid counts per item exercise the per-item marginals."""
    b, mp, np_ = 3, 128, 128
    scores = rng.randn(b, mp, np_).astype(np.float32)
    row_mask = np.zeros((b, mp), bool)
    col_mask = np.zeros((b, np_), bool)
    ms = [100, 128, 57]
    ns = [90, 128, 61]
    for i in range(b):
        row_mask[i, :ms[i]] = True
        col_mask[i, :ns[i]] = True

    want = sinkhorn.log_optimal_transport(
        jnp.asarray(scores), jnp.float32(0.8), 15,
        jnp.asarray(row_mask), jnp.asarray(col_mask),
    )
    got = log_optimal_transport_pallas(
        jnp.asarray(scores), jnp.float32(0.8), 15,
        jnp.asarray(row_mask), jnp.asarray(col_mask), interpret=True,
    )
    for i in range(b):
        sel = np.ix_(
            [i], list(range(ms[i])) + [mp], list(range(ns[i])) + [np_]
        )
        np.testing.assert_allclose(
            np.asarray(got)[sel], np.asarray(want)[sel],
            rtol=2e-4, atol=2e-4,
        )
