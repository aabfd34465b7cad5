"""Ground-truth correspondence under a known homography — fixed-shape JAX.

Parity with reference utils/preprocess_utils.py:98-132 `torch_find_matches`:
project side-0 keypoints through H, then for n_iters rounds take mutual
argmin pairs under dist_thresh and remove them from the pools.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# numpy scalar: a module-level jnp scalar dispatches to the device at
# import time (hangs every import when the axon tunnel is down).
BIG = np.float32(3.0e38)


def warp_keypoints(kpts, H):
    """(N, 2) x (3, 3) -> (N, 2) projective warp
    (reference: preprocess_utils.py:86-96)."""
    ones = jnp.ones((kpts.shape[0], 1), kpts.dtype)
    src = jnp.concatenate([kpts, ones], axis=1)
    dst = src @ H.T
    return dst[:, :2] / dst[:, 2:3]


def find_matches(kpts0, kpts1, H, valid0, valid1,
                 dist_thresh: float = 3.0, n_iters: int = 1):
    """Returns (match0, match1): per-side partner index or -1.

    match0[i] = j means kpts0[i] <-> kpts1[j]; -1 = unmatched (or padded).
    """
    n0 = kpts0.shape[0]
    n1 = kpts1.shape[0]
    proj = warp_keypoints(kpts0, H)
    diff = proj[:, None, :] - kpts1[None, :, :]
    d = jnp.sqrt(jnp.sum(diff * diff, axis=-1))

    def body(_, state):
        match0, match1, avail0, avail1 = state
        dm = jnp.where(avail0[:, None] & avail1[None, :], d, BIG)
        min1 = jnp.argmin(dm, axis=1)          # (N0,) best j per i
        min0 = jnp.argmin(dm, axis=0)          # (N1,) best i per j
        mutual = min0[min1] == jnp.arange(n0)
        dmin = jnp.min(dm, axis=1)
        new = mutual & (dmin < dist_thresh) & avail0
        match0 = jnp.where(new, min1, match0)
        # mutual matches are injective; OOB sentinel drops non-new scatters
        tgt = jnp.where(new, min1, n1)
        match1 = match1.at[tgt].set(jnp.arange(n0, dtype=jnp.int32))
        avail0 = avail0 & ~new
        taken1 = jnp.zeros((n1,), bool).at[min1].max(new)
        avail1 = avail1 & ~taken1
        return (match0, match1, avail0, avail1)

    init = (
        jnp.full((n0,), -1, jnp.int32),
        jnp.full((n1,), -1, jnp.int32),
        valid0,
        valid1,
    )
    match0, match1, _, _ = jax.lax.fori_loop(0, n_iters, body, init)
    return match0, match1


def build_gt_rows(match0, match1, valid0, valid1, batch_index: int):
    """Assemble the reference's GT row list for one pair, fixed shape.

    Reference train.py:120-126: one row per side-0 keypoint — matched
    (b, i, j) or missing (b, i, -1) — plus (b, -1, j) for each unmatched
    side-1 keypoint. Returns (N0+N1, 3) rows + (N0+N1,) validity.
    """
    n0 = match0.shape[0]
    n1 = match1.shape[0]
    i0 = jnp.arange(n0, dtype=jnp.int32)
    rows0 = jnp.stack(
        [jnp.full((n0,), batch_index, jnp.int32), i0, match0], axis=1
    )
    valid_rows0 = valid0
    i1 = jnp.arange(n1, dtype=jnp.int32)
    rows1 = jnp.stack(
        [jnp.full((n1,), batch_index, jnp.int32),
         jnp.full((n1,), -1, jnp.int32), i1], axis=1
    )
    valid_rows1 = valid1 & (match1 < 0)
    rows = jnp.concatenate([rows0, rows1], axis=0)
    valid = jnp.concatenate([valid_rows0, valid_rows1], axis=0)
    return rows, valid
