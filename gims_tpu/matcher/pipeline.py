"""End-to-end jitted matcher pipeline: AGC -> GMatcher -> OT -> matches.

This is the function that compiles once per (bucket0, bucket1) pair and
replays for every image pair — the TPU replacement for the reference's
eager GMatcher.forward (reference: models/gmatcher.py:219-307) and
forward_train (reference: models/gmatcher.py:309-386).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from gims_tpu.config import AGCConfig, MatcherConfig
from gims_tpu.agc.graph import build_graph
from gims_tpu.matcher import sinkhorn
from gims_tpu.matcher.gmatcher import GMatcher, normalize_keypoints


def run_agc(kpts, descs, valid, acfg: AGCConfig, k=None,
            radius=None, min_size=None, defer_unpermute=False):
    """Batched AGC. kpts (B,N,2), descs (B,N,D), valid (B,N).

    `k` is the optional per-item percentile rank (B,) computed host-side.
    `radius`/`min_size` may be traced scalars (parameter sweeps replay the
    same executable); they default to the acfg values.
    Returns (adj (B,N,N), kept (B,N), inv) — inv is None except in band
    defer_unpermute mode, where adj stays in sorted-x space and
    adj_caller[b, i, j] == adj[b, inv[b, i], inv[b, j]] (the caller
    composes inv into its compaction gather instead of paying the full
    (N, N) un-permutation)."""
    radius = acfg.radius if radius is None else radius
    min_size = acfg.min_size if min_size is None else min_size
    if acfg.agc_impl == "band":
        from gims_tpu.agc.graph import build_graph_band

        fn = functools.partial(
            build_graph_band,
            radius=radius,
            percentile=acfg.percentile,
            min_size=min_size,
            cc_rounds=acfg.cc_rounds,
            threshold_stride=acfg.threshold_stride,
            band_halfwidth=acfg.band_halfwidth,
            reconnect_impl=acfg.reconnect_impl,
            reconnect_buckets=acfg.reconnect_buckets,
            defer_unpermute=defer_unpermute,
            cc_impl=acfg.cc_impl if acfg.cc_impl == "band" else "dense",
        )
        # band mode computes its own strided threshold rank; the exact
        # host-side k does not apply
        out = jax.vmap(lambda a, b, c: fn(a, b, c))(kpts, descs, valid)
        return out.adj, out.kept, out.inv
    fn = functools.partial(
        build_graph,
        radius=radius,
        percentile=acfg.percentile,
        min_size=min_size,
        cc_rounds=acfg.cc_rounds,
        threshold_impl=acfg.threshold_impl,
        threshold_stride=acfg.threshold_stride,
        cc_impl=acfg.cc_impl,
        cc_degree=acfg.cc_degree,
        reconnect_impl=acfg.reconnect_impl,
        reconnect_buckets=acfg.reconnect_buckets,
    )
    if k is None:
        out = jax.vmap(lambda a, b, c: fn(a, b, c))(kpts, descs, valid)
    else:
        out = jax.vmap(lambda a, b, c, kk: fn(a, b, c, k=kk))(
            kpts, descs, valid, k
        )
    return out.adj, out.kept, None


def percentile_rank(num_valid: int, percentile: float) -> int:
    """Host-side exact rank of the AGC percentile threshold
    (reference: models/agc.py:378-379)."""
    count = num_valid * (num_valid - 1) // 2
    if count <= 0:
        return 0
    k = int(count * percentile / 100)
    if k >= count:
        k = count - 1
    return k


def _compact_side(kpts, desc, adj, kept, scores, nc: int, inv=None):
    """Gather the kept keypoints of one side into a static (B, nc) bucket.

    AGC keeps ~half the budget at the eval knobs, so the trunk + OT —
    whose cost is quadratic in the bucket — can run on a bucket sized for
    the KEPT set instead of the detection budget. Order: kept first, by
    detection score descending (overflow beyond nc drops the lowest-score
    kept keypoints). Returns (idx (B,nc), kpts_c, desc_c, adj_c, kept_c).

    inv (band defer_unpermute mode): adj is in sorted-x space and
    adj_caller[i, j] == adj[inv[i], inv[j]] — composing inv into the
    gather indices yields the same adj_c without ever materializing the
    caller-order (N, N) matrix. The column gather runs as
    transpose + row gather + transpose (a minor-axis gather on (N, N)
    lowers to a lane-shift relayout on TPU).
    """
    b, n = kept.shape
    sc = jnp.zeros_like(kept, jnp.float32) if scores is None else scores
    key = jnp.where(kept, sc, -jnp.inf)
    idx = jnp.argsort(-key, axis=1, stable=True)[:, :nc]  # (B, nc)
    bi = jnp.arange(b)[:, None]
    kept_c = kept[bi, idx] & (
        jnp.arange(nc)[None, :] < jnp.sum(kept, axis=1, keepdims=True)
    )
    kpts_c = kpts[bi, idx]
    desc_c = desc[bi, idx]
    ci = idx if inv is None else jnp.take_along_axis(inv, idx, axis=1)
    rows = jnp.take_along_axis(
        adj, ci[:, :, None], axis=1)                 # (B, nc, N*)
    adj_c = jnp.take_along_axis(
        rows.swapaxes(1, 2), ci[:, :, None], axis=1).swapaxes(1, 2)
    return idx, kpts_c, desc_c, adj_c, kept_c


def _scatter_back(ext, idx0, idx1, kept0_c, kept1_c, nb0, nb1,
                  mdesc0=None, mdesc1=None):
    """Scatter compacted-trunk outputs back to the padded index space."""
    b = idx0.shape[0]
    bi = jnp.arange(b)[:, None]

    def one(matches_c, mscores_c, idx_self, idx_other, kept_c, nb_self):
        m = jnp.clip(matches_c, 0, None)
        orig = jnp.where(matches_c >= 0,
                         jnp.take_along_axis(idx_other, m, axis=1), -1)
        matches = jnp.full((b, nb_self), -1, jnp.int32)
        matches = matches.at[bi, idx_self].set(orig.astype(jnp.int32))
        mscores = jnp.zeros((b, nb_self), jnp.float32)
        mscores = mscores.at[bi, idx_self].set(mscores_c)
        kept = jnp.zeros((b, nb_self), bool).at[bi, idx_self].set(kept_c)
        return matches, mscores, kept

    matches0, mscores0, kept0 = one(
        ext["matches0"], ext["matching_scores0"], idx0, idx1, kept0_c, nb0)
    matches1, mscores1, kept1 = one(
        ext["matches1"], ext["matching_scores1"], idx1, idx0, kept1_c, nb1)
    out = {
        "matches0": matches0, "matches1": matches1,
        "matching_scores0": mscores0, "matching_scores1": mscores1,
        "kept0": kept0, "kept1": kept1,
    }
    if mdesc0 is not None:
        d = mdesc0.shape[-1]
        out["mdesc0"] = jnp.zeros((b, nb0, d), mdesc0.dtype).at[
            bi, idx0].set(mdesc0)
        out["mdesc1"] = jnp.zeros((b, nb1, d), mdesc1.dtype).at[
            bi, idx1].set(mdesc1)
    return out


def forward_match(
    variables,
    mcfg: MatcherConfig,
    acfg: AGCConfig,
    kpts0, desc0, valid0,
    kpts1, desc1, valid1,
    image_shape,          # (H, W) static python ints
    k0=None, k1=None,
    adj0=None, adj1=None,  # optional precomputed adjacency (Delaunay path)
    radius=None, min_size=None,  # optional traced AGC knobs
    compact_to=None,      # static int: trunk bucket after AGC compaction
    scores0=None, scores1=None,  # detection scores (compaction order)
    shard_axis=None,      # static str: keypoint-axis mesh axis (sharded.py)
):
    """Inference for a batch of pairs. All arrays padded to buckets.

    Returns dict with padded matches/scores plus kept masks (host code
    compacts them to the reference's dict contract, see api.py).

    compact_to: when set (and smaller than the bucket), the trunk + OT run
    on a compacted kept-only bucket of that size — quadratic savings when
    AGC prunes aggressively; results are scattered back so the output
    contract is unchanged.
    """
    nb0, nb1 = kpts0.shape[1], kpts1.shape[1]
    # band + compaction + unsharded: leave the AGC adjacency in sorted-x
    # space and fold the un-permutation into the compaction gather below
    # (bit-identical; saves two full (N, N) passes per side)
    defer = (
        acfg.agc_impl == "band"
        and shard_axis is None
        and compact_to is not None
        and compact_to < max(nb0, nb1)
    )
    inv0 = inv1 = None
    if adj0 is None and adj1 is None and kpts0.shape == kpts1.shape:
        # same bucket on both sides: one batched AGC over the stacked pair
        # halves the fixed per-call costs
        b = kpts0.shape[0]
        kk = None
        if k0 is not None and k1 is not None:
            kk = jnp.concatenate([jnp.atleast_1d(k0), jnp.atleast_1d(k1)])
        adj, kept, inv = run_agc(
            jnp.concatenate([kpts0, kpts1]),
            jnp.concatenate([desc0, desc1]),
            jnp.concatenate([valid0, valid1]),
            acfg, kk, radius, min_size, defer_unpermute=defer,
        )
        adj0, adj1 = adj[:b], adj[b:]
        kept0, kept1 = kept[:b], kept[b:]
        if inv is not None:
            inv0, inv1 = inv[:b], inv[b:]
    else:
        if adj0 is None:
            adj0, kept0, inv0 = run_agc(kpts0, desc0, valid0, acfg, k0,
                                        radius, min_size,
                                        defer_unpermute=defer)
        else:
            kept0 = valid0
        if adj1 is None:
            adj1, kept1, inv1 = run_agc(kpts1, desc1, valid1, acfg, k1,
                                        radius, min_size,
                                        defer_unpermute=defer)
        else:
            kept1 = valid1

    if shard_axis is not None:
        # keypoint-axis scale-out (matcher/sharded.py): pin the dense
        # (B, N, N) adjacency to row shards so the SPMD partitioner never
        # falls back to replicating it (everything downstream propagates
        # from these + the row-sharded inputs; the trunk's attention runs
        # the ring shard_map primitive)
        from jax.sharding import PartitionSpec as _P

        row_mat = _P(None, shard_axis, None)
        adj0 = jax.lax.with_sharding_constraint(adj0, row_mat)
        adj1 = jax.lax.with_sharding_constraint(adj1, row_mat)

    h, w = image_shape
    if compact_to is not None and compact_to < max(nb0, nb1):
        nc = int(compact_to)
        idx0, kpts0, desc0, adj0, kept0_c = _compact_side(
            kpts0, desc0, adj0, kept0, scores0, nc, inv=inv0)
        idx1, kpts1, desc1, adj1, kept1_c = _compact_side(
            kpts1, desc1, adj1, kept1, scores1, nc, inv=inv1)
        kept0, kept1 = kept0_c, kept1_c

    kpts0n = normalize_keypoints(kpts0, h, w, mcfg.normalization)
    kpts1n = normalize_keypoints(kpts1, h, w, mcfg.normalization)

    out = GMatcher(mcfg).apply(
        variables, kpts0n, desc0, adj0, kept0, kpts1n, desc1, adj1, kept1,
        train=False,
    )
    ext = sinkhorn.extract_matches(
        out["Z"], kept0, kept1, mcfg.match_threshold
    )
    if compact_to is not None and compact_to < max(nb0, nb1):
        return _scatter_back(ext, idx0, idx1, kept0, kept1, nb0, nb1,
                             out["mdesc0"], out["mdesc1"])
    return {
        **ext,
        "kept0": kept0,
        "kept1": kept1,
        "mdesc0": out["mdesc0"],
        "mdesc1": out["mdesc1"],
    }


def remap_gt_to_dustbin(gt_rows, gt_valid, kept0, kept1, nb0, nb1,
                        neg_cells: str = "corner"):
    """Reference: models/gmatcher.py:337-374.

    GT rows are (R, 3) = (batch, i0, i1) in ORIGINAL (padded) index space.
    The reference compacts keypoints after AGC and remaps GT through the
    kept-index dictionaries; any row containing -1 — and any row whose
    endpoint was pruned — collapses to (-1, -1), which in torch's negative
    indexing selects the dustbin-dustbin corner cell Z[M, N]. With
    neg_cells="corner" we reproduce that exactly: such rows index
    (nb0, nb1), whose clamped score saturates at 0 (zero gradient — the
    reference defect). With neg_cells="dustbin" the corrected routing
    supervises the REAL dustbin cells: a bad side-0 endpoint maps to row
    nb0, a bad side-1 endpoint to column nb1, so negatives carry gradient.
    """
    b = gt_rows[:, 0]
    i0 = gt_rows[:, 1]
    i1 = gt_rows[:, 2]
    i0c = jnp.clip(i0, 0, nb0 - 1)
    i1c = jnp.clip(i1, 0, nb1 - 1)
    bad0 = (i0 < 0) | (~kept0[b, i0c] & (i0 >= 0))
    bad1 = (i1 < 0) | (~kept1[b, i1c] & (i1 >= 0))
    neg_flag = bad0 | bad1
    if neg_cells == "dustbin":
        i0_eff = jnp.where(bad0, nb0, i0c)
        i1_eff = jnp.where(bad1, nb1, i1c)
    else:
        i0_eff = jnp.where(neg_flag, nb0, i0c)
        i1_eff = jnp.where(neg_flag, nb1, i1c)
    return b, i0_eff, i1_eff, neg_flag & gt_valid, gt_valid


def training_forward(
    variables,
    mcfg: MatcherConfig,
    acfg: AGCConfig,
    kpts0, desc0, valid0,
    kpts1, desc1, valid1,
    gt_rows, gt_valid,
    image_shape,
    k0=None, k1=None,
    mutable=("batch_stats",),
):
    """Train-mode forward returning (total, pos, neg) losses.

    Loss parity: reference models/gmatcher.py:369-386 — coupling values at
    GT indices clamped to [-100, 0], negated, averaged per batch item
    separately over positive and negative rows (torch_scatter.scatter_mean),
    then weighted and averaged over the batch.
    """
    batch = kpts0.shape[0]
    nb0, nb1 = kpts0.shape[1], kpts1.shape[1]
    adj0, kept0, _ = run_agc(kpts0, desc0, valid0, acfg, k0)
    adj1, kept1, _ = run_agc(kpts1, desc1, valid1, acfg, k1)

    h, w = image_shape
    kpts0n = normalize_keypoints(kpts0, h, w, mcfg.normalization)
    kpts1n = normalize_keypoints(kpts1, h, w, mcfg.normalization)

    out, updates = GMatcher(mcfg).apply(
        variables, kpts0n, desc0, adj0, kept0, kpts1n, desc1, adj1, kept1,
        train=True, mutable=list(mutable),
    )
    Z = out["Z"]

    b, i0_eff, i1_eff, neg_flag, row_valid = remap_gt_to_dustbin(
        gt_rows, gt_valid, kept0, kept1, nb0, nb1, mcfg.neg_cells
    )
    vals = Z[b, i0_eff, i1_eff]
    vals = jnp.clip(vals, -100.0, 0.0)
    loss_vec = -vals

    pos_w = (row_valid & ~neg_flag).astype(jnp.float32)
    neg_w = (row_valid & neg_flag).astype(jnp.float32)
    pos_sum = jax.ops.segment_sum(loss_vec * pos_w, b, num_segments=batch)
    pos_cnt = jax.ops.segment_sum(pos_w, b, num_segments=batch)
    neg_sum = jax.ops.segment_sum(loss_vec * neg_w, b, num_segments=batch)
    neg_cnt = jax.ops.segment_sum(neg_w, b, num_segments=batch)
    batched_pos = pos_sum / jnp.maximum(pos_cnt, 1.0)
    batched_neg = neg_sum / jnp.maximum(neg_cnt, 1.0)
    pos_loss = mcfg.pos_loss_weight * jnp.mean(batched_pos)
    neg_loss = mcfg.neg_loss_weight * jnp.mean(batched_neg)
    total = pos_loss + neg_loss
    return total, (pos_loss, neg_loss, updates)
