"""Log-domain optimal transport (Sinkhorn) with dustbins, mask-aware.

Math parity with the reference (reference: models/gmatcher.py:41-69):
an (M+1)x(N+1) coupling in log space, dustbin row/col scored by a learned
scalar, uniform marginals 1/(ms+ns) on real cells and ns/(ms+ns), ms/(ms+ns)
on the dustbins, `iters` alternating row/col logsumexp normalizations, and a
final +log(ms+ns) shift.

TPU-native differences:
* fixed-iteration `jax.lax.fori_loop` (compiles to a single fused loop),
* padded shapes with -inf-style masking: ms/ns are the *valid* counts, not
  the padded sizes, and padded rows/cols carry zero transport mass, so the
  result on the valid block is bit-comparable to the unpadded reference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Large-negative stand-in for -inf. Using a finite value avoids (-inf)-(-inf)
# NaNs inside logsumexp while still flushing exp() to exactly 0 in f32.
NEG_INF = -1e9


def masked_logsumexp(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    """logsumexp that treats entries <= NEG_INF/2 as absent.

    Stable even when an entire slice is absent (returns NEG_INF there).
    """
    m = jnp.max(x, axis=axis, keepdims=True)
    m_safe = jnp.maximum(m, NEG_INF)  # all-absent slice -> NEG_INF
    s = jnp.sum(jnp.exp(x - m_safe), axis=axis, keepdims=True)
    out = jnp.squeeze(m_safe, axis) + jnp.log(
        jnp.maximum(jnp.squeeze(s, axis), 1e-38)
    )
    return jnp.maximum(out, NEG_INF)


def log_sinkhorn_iterations(
    Z: jnp.ndarray, log_mu: jnp.ndarray, log_nu: jnp.ndarray, iters: int
) -> jnp.ndarray:
    """Alternating row/col normalization in log space.

    Z: (B, M1, N1) cost/score matrix (already includes dustbins).
    log_mu: (B, M1), log_nu: (B, N1); absent entries = NEG_INF.
    """

    def body(_, uv):
        u, v = uv
        u = log_mu - masked_logsumexp(Z + v[:, None, :], axis=2)
        v = log_nu - masked_logsumexp(Z + u[:, :, None], axis=1)
        return (u, v)

    # checkpoint: backward-pass residuals per iteration are just (u, v)
    # vectors — without this, AD saves the (B, M1, N1) logsumexp operand
    # for every iteration (iters * |Z| bytes; OOM at eval-scale N).
    # Free for forward-only use.
    body = jax.checkpoint(body)

    u0 = jnp.zeros_like(log_mu)
    v0 = jnp.zeros_like(log_nu)
    u, v = jax.lax.fori_loop(0, iters, body, (u0, v0))
    return Z + u[:, :, None] + v[:, None, :]


def log_optimal_transport(
    scores: jnp.ndarray,
    alpha: jnp.ndarray,
    iters: int,
    row_mask: jnp.ndarray,
    col_mask: jnp.ndarray,
) -> jnp.ndarray:
    """Pad scores with dustbins and run Sinkhorn, honoring validity masks.

    Args:
      scores: (B, M, N) similarity matrix (padded; invalid entries ignored).
      alpha: scalar dustbin score (learned).
      iters: number of Sinkhorn iterations (static).
      row_mask: (B, M) bool validity of rows.
      col_mask: (B, N) bool validity of cols.

    Returns:
      (B, M+1, N+1) log-coupling. Valid block matches the reference's
      unpadded output; invalid rows/cols are ~NEG_INF.
    """
    b, m, n = scores.shape
    ms = jnp.sum(row_mask, axis=1).astype(scores.dtype)  # (B,)
    ns = jnp.sum(col_mask, axis=1).astype(scores.dtype)

    pair_ok = row_mask[:, :, None] & col_mask[:, None, :]
    scores = jnp.where(pair_ok, scores, NEG_INF)

    bins0 = jnp.where(row_mask, alpha, NEG_INF)[:, :, None]          # (B, M, 1)
    bins1 = jnp.where(col_mask, alpha, NEG_INF)[:, None, :]          # (B, 1, N)
    corner = jnp.full((b, 1, 1), alpha, scores.dtype)

    couplings = jnp.concatenate(
        [
            jnp.concatenate([scores, bins0], axis=2),
            jnp.concatenate([bins1, corner], axis=2),
        ],
        axis=1,
    )  # (B, M+1, N+1)

    norm = -jnp.log(ms + ns)  # (B,)
    log_mu = jnp.concatenate(
        [
            jnp.where(row_mask, norm[:, None], NEG_INF),
            (jnp.log(jnp.maximum(ns, 1e-38)) + norm)[:, None],
        ],
        axis=1,
    )  # (B, M+1)
    log_nu = jnp.concatenate(
        [
            jnp.where(col_mask, norm[:, None], NEG_INF),
            (jnp.log(jnp.maximum(ms, 1e-38)) + norm)[:, None],
        ],
        axis=1,
    )  # (B, N+1)

    Z = log_sinkhorn_iterations(couplings, log_mu, log_nu, iters)
    Z = Z - norm[:, None, None]  # multiply probabilities by M+N
    return Z


def extract_matches(
    Z: jnp.ndarray,
    row_mask: jnp.ndarray,
    col_mask: jnp.ndarray,
    match_threshold: float,
):
    """Mutual-max match extraction with confidence thresholding.

    Parity with reference: models/gmatcher.py:284-294 — mutual argmax over the
    non-dustbin block, confidence = exp(max coupling), threshold on side-0
    confidence, side-1 validity gated through side-0.

    Returns dict of (B, M)/(B, N) arrays: matches0, matches1 (−1 = no match,
    padded slots also −1), matching_scores0, matching_scores1.
    """
    b, m1, n1 = Z.shape
    m, n = m1 - 1, n1 - 1
    block = Z[:, :m, :n]
    pair_ok = row_mask[:, :, None] & col_mask[:, None, :]
    block = jnp.where(pair_ok, block, NEG_INF)

    max0 = jnp.max(block, axis=2)          # (B, M)
    indices0 = jnp.argmax(block, axis=2)
    max1 = jnp.max(block, axis=1)          # (B, N)
    indices1 = jnp.argmax(block, axis=1)

    ar0 = jnp.arange(m)[None, :]
    ar1 = jnp.arange(n)[None, :]
    gather01 = jnp.take_along_axis(indices1, indices0, axis=1)  # indices1[indices0]
    gather10 = jnp.take_along_axis(indices0, indices1, axis=1)
    mutual0 = (ar0 == gather01) & row_mask
    mutual1 = (ar1 == gather10) & col_mask

    mscores0 = jnp.where(mutual0, jnp.exp(max0), 0.0)
    mscores1 = jnp.where(
        mutual1, jnp.take_along_axis(mscores0, indices1, axis=1), 0.0
    )
    valid0 = mutual0 & (mscores0 > match_threshold)
    valid1 = mutual1 & jnp.take_along_axis(valid0, indices1, axis=1)
    matches0 = jnp.where(valid0, indices0, -1).astype(jnp.int32)
    matches1 = jnp.where(valid1, indices1, -1).astype(jnp.int32)
    return {
        "matches0": matches0,
        "matches1": matches1,
        "matching_scores0": mscores0.astype(jnp.float32),
        "matching_scores1": mscores1.astype(jnp.float32),
    }
