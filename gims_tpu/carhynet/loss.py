"""HyNet hybrid loss for descriptor training — JAX.

Parity with reference carhynet/models.py:520-636 `Loss_HyNet`:
* hybrid triplet loss over the hardest negative drawn from four distance
  matrices (within-L, within-R, cross both directions), with the
  second-order distance shaping term d + d^2/2 * alpha,
* raw-descriptor norm consistency loss (x0.1),
* optional second-order similarity (SOS) regularization over the union of
  kNN graphs.

Distance convention (reference carhynet/util.py:13-18): descriptors are
L2-normalized, d(x, y) = sqrt(|2(1 - x.y)| + eps).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

DIST_TH = 8e-3   # reference carhynet/util.py:9
EPS_SQRT = 1e-6


def l2_distance_matrix(x, y):
    """(N, D) x (M, D) -> (N, M), both inputs L2-normalized."""
    sim = jnp.matmul(x, y.T, precision=jax.lax.Precision.HIGHEST)
    return jnp.sqrt(jnp.abs(2.0 * (1.0 - sim)) + EPS_SQRT)


def _mask_sorted(mat, pos_mask):
    """Penalize positives and degenerate tiny distances before sorting
    (reference: models.py:535-549 adds 2x indicators)."""
    return mat + 2.0 * pos_mask + 2.0 * (mat <= DIST_TH)


def hynet_loss(desc_l, desc_r, desc_raw_l, desc_raw_r,
               margin: float = 1.2, alpha: float = 2.0,
               is_sosr: bool = False, knn_sos: int = 8):
    """Returns (loss, dist_pos_mean, dist_neg_mean).

    desc_l/desc_r: (N, D) L2-normalized; raw: pre-normalization outputs.
    Row i of L corresponds to row i of R (positive pairs on the diagonal).
    """
    n = desc_l.shape[0]
    eye = jnp.eye(n, dtype=desc_l.dtype)

    L = l2_distance_matrix(desc_l, desc_l)
    R = l2_distance_matrix(desc_r, desc_r)
    LR = l2_distance_matrix(desc_l, desc_r)

    Lm = _mask_sorted(jax.lax.stop_gradient(L), eye)
    Rm = _mask_sorted(jax.lax.stop_gradient(R), eye)
    LRm = _mask_sorted(jax.lax.stop_gradient(LR), eye)

    idx_l = jnp.argsort(Lm, axis=1)          # per-row ascending
    idx_r = jnp.argsort(Rm, axis=0)          # per-col ascending
    idx_lr = jnp.argsort(LRm, axis=1)
    idx_rl = jnp.argsort(LRm, axis=0)

    ar = jnp.arange(n)
    dist_pos = LR[ar, ar]
    dist_neg = jnp.stack([
        L[ar, idx_l[:, 0]],
        R[idx_r[0, :], ar],
        LR[ar, idx_lr[:, 0]],
        LR[idx_rl[0, :], ar],
    ])
    dist_neg_hard = jnp.min(dist_neg, axis=0)

    shaped = lambda d: d + d * d / 2.0 * alpha
    loss_triplet = jnp.maximum(
        margin + shaped(dist_pos) - shaped(dist_neg_hard), 0.0
    )
    loss = jnp.sum(loss_triplet)

    norm_l = jnp.sqrt(jnp.sum(desc_raw_l**2, axis=1) + EPS_SQRT)
    norm_r = jnp.sqrt(jnp.sum(desc_raw_r**2, axis=1) + EPS_SQRT)
    loss = loss + 0.1 * jnp.sum((norm_l - norm_r) ** 2)

    if is_sosr:
        def knn_adj(rows_idx, axis):
            a = jnp.zeros((n, n), desc_l.dtype)
            if axis == 1:
                return a.at[ar[:, None], rows_idx[:, :knn_sos]].set(1.0)
            return a.at[rows_idx[:knn_sos, :], ar[None, :]].set(1.0)

        A_l = knn_adj(idx_l, 1)
        A_r = knn_adj(idx_r, 0)
        A_lr = knn_adj(idx_lr, 1) + knn_adj(idx_rl, 0)
        sym = lambda a: ((a + a.T) > 0).astype(desc_l.dtype)
        A = sym(A_l) + sym(A_r) + sym(A_lr)
        A = (A > 0).astype(desc_l.dtype) * (1.0 - eye)
        dif = (L - R) * A
        loss = loss + jnp.sum(
            jnp.sqrt(jnp.sum(dif**2, axis=1) + EPS_SQRT)
        )

    return (
        loss,
        jax.lax.stop_gradient(jnp.mean(dist_pos)),
        jax.lax.stop_gradient(jnp.mean(dist_neg_hard)),
    )


def cal_fpr95(dist_pos, dist_neg):
    """False positive rate at 95% true-positive recall
    (reference capability: carhynet/util.py:464+)."""
    import numpy as np

    dist_pos = np.sort(np.asarray(dist_pos))
    thresh = dist_pos[int(0.95 * (len(dist_pos) - 1))]
    return float((np.asarray(dist_neg) <= thresh).mean())
