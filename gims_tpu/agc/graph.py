"""Adaptive Graph Construction (AGC) as dense masked TPU ops.

Semantics-parity rebuild of the reference pipeline (reference:
models/agc.py:682-709 `build_optimize_graph_with_cosine_similarity`):

  1. spatial candidate edges: all pairs within `radius`
     (reference: cKDTree.query_pairs, agc.py:436),
  2. keep candidates whose descriptor cosine similarity >= the
     `percentile`-th order statistic of ALL upper-triangle similarities
     (reference: agc.py:438-440, 367-380),
  3. connect isolated nodes to their nearest spatial neighbor
     (reference: agc.py:476-495),
  4. drop connected components smaller than `min_size`
     (reference: agc.py:497-516) — here nodes are *masked out*, never
     physically removed, which keeps shapes static,
  5. single-pass reconnection of each surviving component to its
     nearest-centroid neighbor component through the closest node pair
     (reference: agc.py:518-565).

Everything is fixed-shape: adjacency is a dense (N, N) bool matrix, the
percentile is an exact k-th order statistic found by float bisection, and
connected components use min-label propagation + pointer jumping
(<= cc_rounds fixed rounds), all verified against networkx/scipy oracles in
tests/test_agc.py.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

# numpy scalar on purpose: a module-level jnp scalar is a device dispatch
# at import time, which initializes the backend (and hangs every import —
# including the driver's __graft_entry__ load — when the axon tunnel is
# down). np.float32 keeps the f32 dtype in jnp expressions without
# touching a device.
BIG = np.float32(3.0e38)


class AGCGraph(NamedTuple):
    """Result of graph construction for one padded keypoint set."""

    adj: jnp.ndarray        # (N, N) bool symmetric adjacency, no self loops
    kept: jnp.ndarray       # (N,) bool — valid AND survived min_size pruning
    labels: jnp.ndarray     # (N,) int32 component label (min node id; N = invalid)
    threshold: jnp.ndarray  # () f32 cosine threshold actually used


def pairwise_sq_dists(kpts: jnp.ndarray) -> jnp.ndarray:
    """(N, 2) -> (N, N) squared Euclidean distances.

    Computed by explicit differencing (not the |x|^2-2xy+|y|^2 trick) to
    keep f32 accuracy comparable to scipy's KD-tree for radius tests.
    """
    d = kpts[:, None, :] - kpts[None, :, :]
    return jnp.sum(d * d, axis=-1)


def cosine_similarity_matrix(descs: jnp.ndarray) -> jnp.ndarray:
    """(N, D) -> (N, N) cosine similarity of L2-normalized rows.

    Matches torch.nn.functional.normalize(dim=1) + matmul
    (reference: agc.py:382-391): rows are divided by max(||x||, eps).
    """
    norm = jnp.linalg.norm(descs, axis=1, keepdims=True)
    normed = descs / jnp.maximum(norm, 1e-12)
    # HIGH = 3-pass bf16 accumulation (~22 mantissa bits for these
    # well-conditioned unit-vector dots) — indistinguishable from f32 for
    # the >= threshold comparison downstream, and 2x the MXU rate of
    # HIGHEST (6-pass). The order statistic stays exact *of these values*:
    # threshold and comparisons read the same array.
    return jnp.matmul(normed, normed.T, precision=jax.lax.Precision.HIGH)


def kth_smallest_masked(values: jnp.ndarray, mask: jnp.ndarray, k: jnp.ndarray,
                        lo: float, hi: float, passes: int = 12,
                        fanout: int = 8) -> jnp.ndarray:
    """Exact k-th (0-indexed) order statistic of values[mask] by multisection.

    Replaces np.partition(similarities, k)[k] (reference: agc.py:367-380)
    without sorting the O(N^2) similarity set. Each pass counts fanout-1
    interior thresholds in ONE fused read of `values`, narrowing the
    bracket by `fanout` per pass — 12 passes x 8-way = 2^36 narrowing,
    tighter than the 34 halvings this replaces. Measured on the v5e at
    N=12288 (scripts/bench_threshold.py): one count pass is HBM-roofline
    (~1.4 ms marginal), wider fanouts go VPU-bound (64-way costs 23 ms/
    pass), so fanout=8/passes=12 is the sweet spot: 77 ms vs 98 ms
    (bisection) vs 176 ms (64-way) for two images. After the bracket is
    below f32 spacing, the result is snapped to the smallest actual
    element > lo_final, so the returned threshold is an exact member of
    the set (ties then behave identically under the reference's >=
    comparison).
    """
    values = values.astype(jnp.float32)
    frac = (jnp.arange(1, fanout, dtype=jnp.float32) / fanout)
    reduce_axes = tuple(range(values.ndim))

    def body(_, state):
        lo_, hi_ = state
        ts = lo_ + (hi_ - lo_) * frac  # (fanout-1,) interior thresholds
        # one sibling-fused read of `values`: separate scalar reductions
        # keep the (8, 128) lane tiling clean — a trailing broadcast dim
        # of fanout-1 would break it and cost ~2x per pass on the VPU
        cnt = jnp.stack([
            jnp.sum(((values <= ts[i]) & mask).astype(jnp.int32),
                    axis=reduce_axes)
            for i in range(frac.shape[0])
        ])
        below = cnt < (k + 1)  # invariant: count(<=lo) < k+1 <= count(<=hi)
        lo_ = jnp.max(jnp.where(below, ts, lo_))
        hi_ = jnp.min(jnp.where(below, hi_, ts))
        return (lo_, hi_)

    lo_f, hi_f = jax.lax.fori_loop(
        0, passes, body, (jnp.float32(lo), jnp.float32(hi))
    )
    snapped = jnp.min(jnp.where(mask & (values > lo_f), values, BIG))
    return jnp.where(jnp.any(mask), jnp.minimum(snapped, hi_f), jnp.float32(0.0))


def connected_components(adj: jnp.ndarray, valid: jnp.ndarray,
                         rounds: int) -> jnp.ndarray:
    """Min-label propagation with pointer jumping.

    Returns (N,) int32 labels; each component is labeled by its minimum
    node index (invalid nodes get the sentinel N). Convergence: hooking via
    neighbor-min plus 3 pointer jumps per round covers any component
    diameter reachable by ~8x growth per round; tests cover path graphs.
    """
    n = adj.shape[0]
    sentinel = jnp.int32(n)
    idx = jnp.arange(n, dtype=jnp.int32)
    label0 = jnp.where(valid, idx, sentinel)

    def one_round(label):
        neigh = jnp.where(adj, label[None, :], sentinel)
        neigh_min = jnp.min(neigh, axis=1)
        label = jnp.minimum(label, jnp.where(valid, neigh_min, sentinel))
        for _ in range(3):
            safe = jnp.minimum(label, n - 1)
            jumped = jnp.where(label < n, label[safe], sentinel)
            label = jnp.minimum(label, jumped)
        return label

    # Early exit: real AGC graphs converge in 2-5 rounds (the ~8x diameter
    # growth per round); `rounds` stays as the worst-case cap. Trip count is
    # runtime-dynamic but shapes are static — no recompiles. Labels are
    # int32, so no gradient flows through the loop.
    def cond(state):
        i, _, changed = state
        return changed & (i < rounds)

    def body(state):
        i, label, _ = state
        new = one_round(label)
        return i + 1, new, jnp.any(new != label)

    _, label, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), one_round(label0), jnp.bool_(True))
    )
    return label


def _first_min_index(values: jnp.ndarray, mask: jnp.ndarray,
                     axis: int = -1) -> jnp.ndarray:
    """(min, first-argmin) over a masked axis; sentinel = axis length."""
    n = values.shape[axis]
    masked = jnp.where(mask, values, BIG)
    mn = jnp.min(masked, axis=axis)
    hit = mask & (values == jnp.expand_dims(mn, axis))
    ar_shape = [1] * values.ndim
    ar_shape[axis] = n
    ar = jnp.arange(n, dtype=jnp.int32).reshape(ar_shape)
    arg = jnp.min(jnp.where(hit, ar, jnp.int32(n)), axis=axis)
    return mn, arg


def build_graph(
    kpts: jnp.ndarray,
    descs: jnp.ndarray,
    valid: jnp.ndarray,
    radius: float,
    percentile: float,
    min_size: int,
    cc_rounds: int = 20,
    k=None,
    threshold_impl: str = "exact",
    threshold_stride: int = 4,
) -> AGCGraph:
    """Full AGC for one padded keypoint set.

    Args:
      kpts: (N, 2) f32 padded keypoint xy.
      descs: (N, D) f32 padded descriptors (unnormalized, as stored).
      valid: (N,) bool padding mask.
      radius/percentile/min_size: AGC knobs (see AGCConfig).
      k: optional precomputed rank of the percentile threshold
         (= int(num_valid_pairs * percentile / 100), clipped). Callers that
         know the valid count on the host should pass it for exact integer
         math; the in-graph fallback computes it in f32 (exact below ~16M
         pairs, i.e. N <~ 5800).
    """
    n = kpts.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    pair_valid = valid[:, None] & valid[None, :]
    off_diag = idx[:, None] != idx[None, :]

    d2 = pairwise_sq_dists(kpts)
    sim = cosine_similarity_matrix(descs)

    # --- percentile threshold over the valid upper triangle ---
    triu = pair_valid & (idx[:, None] < idx[None, :])
    if threshold_impl == "approx" and threshold_stride > 1:
        # Subsampled percentile: exact k-th order statistic of every
        # `stride`-th row's upper-triangle similarities. The multisection
        # reads 1/stride of the matrix per pass; the rank is recomputed
        # for the subsample's own pair count (the caller's k — exact for
        # the full set — does not apply to the subsample).
        s = int(threshold_stride)
        sim_sub = sim[::s]
        mask_sub = triu[::s]
        cnt_sub = jnp.sum(mask_sub.astype(jnp.int32))
        k_sub = jnp.floor(
            cnt_sub.astype(jnp.float32) * jnp.float32(percentile / 100.0)
        ).astype(jnp.int32)
        k_sub = jnp.clip(k_sub, 0, jnp.maximum(cnt_sub - 1, 0))
        threshold = kth_smallest_masked(sim_sub, mask_sub, k_sub,
                                        lo=-1.001, hi=1.001)
    else:
        if k is None:
            nv = jnp.sum(valid.astype(jnp.int32))
            count = (nv * (nv - 1)) // 2
            k = jnp.floor(
                count.astype(jnp.float32) * jnp.float32(percentile / 100.0)
            ).astype(jnp.int32)
            k = jnp.where(k >= count, count - 1, k)  # reference: agc.py:379
            k = jnp.maximum(k, 0)
        else:
            k = jnp.asarray(k, jnp.int32)
        threshold = kth_smallest_masked(sim, triu, k, lo=-1.001, hi=1.001)

    # --- candidate edges: within radius AND similarity >= threshold ---
    radius = jnp.asarray(radius, jnp.float32)  # traced: sweeps don't recompile
    within = d2 <= radius * radius
    adj = pair_valid & off_diag & within & (sim >= threshold)

    # --- connect isolated nodes to the nearest spatial neighbor ---
    degree = jnp.sum(adj, axis=1)
    has_any_edge = jnp.any(adj)  # reference skips the fix on edgeless graphs
    isolated = valid & (degree == 0) & has_any_edge
    _, nn_idx = _first_min_index(d2, pair_valid & off_diag, axis=1)
    nn_idx = jnp.minimum(nn_idx, n - 1)
    fix = jnp.zeros_like(adj).at[idx, nn_idx].max(isolated)
    adj = adj | fix | fix.T

    # --- connected components + small-component pruning ---
    labels = connected_components(adj, valid, cc_rounds)
    safe_labels = jnp.minimum(labels, n - 1)
    sizes = jax.ops.segment_sum(valid.astype(jnp.int32), safe_labels,
                                num_segments=n)
    kept = valid & (sizes[safe_labels] >= jnp.asarray(min_size, jnp.int32))

    # --- drop edges touching removed nodes, then reconnect survivors ---
    adj = adj & kept[:, None] & kept[None, :]
    adj = _reconnect_components(adj, kpts, d2, labels, kept)
    return AGCGraph(adj=adj, kept=kept, labels=labels, threshold=threshold)


def _reconnect_components(adj, kpts, d2, labels, kept):
    """Reference: agc.py:518-565 `fast_connect_components`.

    Single pass: each surviving component links to its nearest component by
    centroid distance through the closest node pair. A link (i, j) is
    skipped when (j, i) was already made earlier in the pass; enumeration
    order is ascending component label (= ascending min node id, matching
    networkx's connected_components order for nodes inserted 0..N-1).

    Labels are rank-compacted to C = min(n, 4096) dense component ids so
    the per-component tables are (C+1, N) instead of (n+1, N) — several
    times less HBM traffic at eval scale. Rank order equals label order,
    so the enumeration-order-dependent skip rule is unchanged. (If a
    degenerate graph exceeds C components, the overflow components share
    the last bucket: their links may merge; nothing crashes.)
    """
    n = kpts.shape[0]
    C = min(n, 4096)
    idx = jnp.arange(n, dtype=jnp.int32)
    safe_labels = jnp.minimum(labels, n - 1)
    is_rep = kept & (labels == idx)
    rank = jnp.cumsum(is_rep.astype(jnp.int32)) - 1  # rank of rep i, at i
    rank = jnp.clip(rank, 0, C - 1)
    # component id of each node in [0, C]; C is the "invalid" bucket
    lab = jnp.where(kept, rank[safe_labels], jnp.int32(C))

    cnt = jax.ops.segment_sum(kept.astype(jnp.float32), lab, num_segments=C + 1)
    comp_ok = cnt > 0
    comp_ok = comp_ok.at[C].set(False)
    num_comps = jnp.sum(comp_ok)

    sx = jax.ops.segment_sum(jnp.where(kept, kpts[:, 0], 0.0), lab, num_segments=C + 1)
    sy = jax.ops.segment_sum(jnp.where(kept, kpts[:, 1], 0.0), lab, num_segments=C + 1)
    cent = jnp.stack([sx, sy], axis=-1) / jnp.maximum(cnt, 1.0)[:, None]

    cd = cent[:, None, :] - cent[None, :, :]
    cd2 = jnp.sum(cd * cd, axis=-1)  # (C+1, C+1)
    comp_ids = jnp.arange(C + 1, dtype=jnp.int32)
    comp_pair_ok = (
        comp_ok[:, None] & comp_ok[None, :]
        & (comp_ids[:, None] != comp_ids[None, :])
    )
    _, nnc = _first_min_index(cd2, comp_pair_ok, axis=1)  # (C+1,), sentinel C+1
    nnc_safe = jnp.minimum(nnc, C)

    # skip rule: pair (l, nnc[l]) is dropped iff nnc[l] < l and it already
    # linked back to us (nnc[nnc[l]] == l)
    link_ok = comp_ok & (nnc <= C) & ~((nnc < comp_ids) & (nnc_safe[nnc_safe] == comp_ids))
    link_ok = link_ok & (num_comps > 1)

    # md[c, v] = min_{u in comp c} d2[u, v] — the one unavoidable (N, N)
    # segment reduction. The link endpoints only need the nnc[l]-restricted
    # argmins, so everything below works on (C+1, N) / (N, C+1) tables
    # instead of the former full (N, N) hit-tensor passes (~4 GB less HBM
    # traffic per image at N = 12288).
    d2_rows_masked = jnp.where(kept[:, None], d2, BIG)
    md = jax.ops.segment_min(d2_rows_masked, lab, num_segments=C + 1)  # (C+1, N)

    # v*(l) = first argmin over kept v with lab(v) == nnc[l] of md[l, v]
    tgt_mask = (lab[None, :] == nnc_safe[:, None]) & kept[None, :]  # (C+1, N)
    _, v_l = _first_min_index(md, tgt_mask, axis=1)                 # sentinel n
    v_l_safe = jnp.minimum(v_l, n - 1)

    # u*(l) = first argmin over kept u with lab(u) == l of d2[u, v*(l)]
    dcols = d2[:, v_l_safe]                                         # (N, C+1)
    src_mask = (lab[:, None] == comp_ids[None, :]) & kept[:, None]  # (N, C+1)
    _, u_l = _first_min_index(dcols, src_mask, axis=0)              # sentinel n
    u_l_safe = jnp.minimum(u_l, n - 1)
    ok = link_ok & (v_l < n) & (u_l < n)

    new_edges = jnp.zeros_like(adj).at[u_l_safe, v_l_safe].max(ok)
    return adj | new_edges | new_edges.T


def delaunay_adjacency_host(kpts, valid):
    """Host-side Delaunay adjacency (D-GIMS variant).

    Reference: agc.py:718-752. Runs scipy Delaunay on the valid keypoints
    and scatters the simplex edges into a dense (N, N) bool matrix.
    (The reference's Delaunay inference path crashes with a NameError at
    gmatcher.py:250; here the variant is actually usable: all nodes are kept.)
    """
    import numpy as np
    from scipy.spatial import Delaunay

    kpts = np.asarray(kpts)
    valid = np.asarray(valid, bool)
    n = kpts.shape[0]
    adj = np.zeros((n, n), dtype=bool)
    pts_idx = np.nonzero(valid)[0]
    if pts_idx.shape[0] >= 3:
        tri = Delaunay(kpts[pts_idx])
        s = tri.simplices  # (T, 3) indices into pts_idx
        for a, b in ((0, 1), (0, 2), (1, 2)):
            ia, ib = pts_idx[s[:, a]], pts_idx[s[:, b]]
            adj[ia, ib] = True
            adj[ib, ia] = True
    return adj
