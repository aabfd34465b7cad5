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

from typing import NamedTuple, Optional

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
    # band defer_unpermute mode only: adj is in SORTED-x space (padded to
    # the build's internal 128-multiple) and inv[i] is caller row i's
    # sorted position — adj_caller[i, j] == adj[inv[i], inv[j]]. Callers
    # that compact the graph compose inv into their gather instead of
    # paying the full (N, N) un-permutation (gims_tpu/matcher/pipeline.py).
    inv: Optional[jnp.ndarray] = None


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


def neighbor_list(d2: jnp.ndarray, adj: jnp.ndarray, pair_valid_od: jnp.ndarray,
                  degree_cap: int):
    """One top_k pass -> fixed-degree neighbor list + spatial NN per node.

    The AGC graph is radius-bounded and percentile-gated, so degrees are
    tiny (mean ~5, max ~23 at the 6144-keypoint eval operating point —
    scripts/bench_agc_stages.py). Keying the top_k by
    ``d2 + OFF * (1 - adj)`` ranks every TRUE neighbor before every
    non-neighbor (edges require d2 <= radius^2 << OFF), so:

      * entries with key < OFF are the (up to degree_cap) nearest true
        neighbors -> the sparse CC edge list;
      * entry 0 is always the nearest valid node overall -> the isolated-
        node fix target, replacing a full (N, N) argmin pass.

    OFF = 1e7 keeps f32 quantization of non-neighbor keys at 1 px^2, so
    the spatial-NN tie-break can differ from the exact argmin only for
    candidates within 1 px^2 of each other.

    Returns (nbr_idx (N, D) int32, nbr_ok (N, D) bool, top_key (N, D) f32).
    """
    n = d2.shape[0]
    dcap = min(int(degree_cap), n)
    OFF = np.float32(1.0e7)
    key = jnp.where(adj, d2, d2 + OFF)
    key = jnp.where(pair_valid_od, key, BIG)
    neg_top, nbr_idx = jax.lax.top_k(-key, dcap)
    top_key = -neg_top
    nbr_ok = top_key < OFF
    return nbr_idx.astype(jnp.int32), nbr_ok, top_key


def connected_components_sparse(nbr_idx: jnp.ndarray, nbr_ok: jnp.ndarray,
                                valid: jnp.ndarray, rounds: int) -> jnp.ndarray:
    """Min-label propagation over a fixed-degree neighbor list.

    Same result contract as :func:`connected_components` (labels = min node
    id per component; invalid nodes get sentinel N) but each round costs
    O(N * D) instead of O(N^2): a gather over my out-neighbors, a
    segment_min push TO my out-neighbors (so an edge kept by either
    endpoint propagates both ways — the list need not be symmetric), and
    3 pointer jumps. Exact whenever every node's true degree <= D (the
    push direction covers edges the overflowing endpoint dropped as long
    as the other endpoint kept them).
    """
    n, dcap = nbr_idx.shape
    sentinel = jnp.int32(n)
    idx = jnp.arange(n, dtype=jnp.int32)
    label0 = jnp.where(valid, idx, sentinel)
    safe_nbr = jnp.minimum(nbr_idx, n - 1)
    push_tgt = jnp.where(nbr_ok, nbr_idx, jnp.int32(n)).ravel()

    def one_round(label):
        pulled = jnp.min(jnp.where(nbr_ok, label[safe_nbr], sentinel), axis=1)
        label = jnp.minimum(label, jnp.where(valid, pulled, sentinel))
        src = jnp.broadcast_to(label[:, None], (n, dcap)).ravel()
        pushed = jax.ops.segment_min(src, push_tgt, num_segments=n + 1)[:n]
        pushed = jnp.minimum(pushed, sentinel)  # empty segments = int32 max
        label = jnp.minimum(label, jnp.where(valid, pushed, sentinel))
        for _ in range(3):
            safe = jnp.minimum(label, n - 1)
            jumped = jnp.where(label < n, label[safe], sentinel)
            label = jnp.minimum(label, jumped)
        return label

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
    cc_impl: str = "dense",
    cc_degree: int = 32,
    reconnect_impl: str = "exact",
    reconnect_buckets: int = 4096,
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

    if cc_impl == "sparse":
        # --- sparse back half: one top_k pass replaces the dense degree,
        # NN-argmin, and per-round O(N^2) label-propagation traffic ---
        nbr_idx, nbr_ok, top_key = neighbor_list(
            d2, adj, pair_valid & off_diag, cc_degree)
        degree_capped = jnp.sum(nbr_ok.astype(jnp.int32), axis=1)
        has_any_edge = jnp.any(nbr_ok)
        nn_exists = top_key[:, 0] < BIG
        isolated = valid & (degree_capped == 0) & has_any_edge & nn_exists
        nn_idx = jnp.minimum(nbr_idx[:, 0], n - 1)
        # the fix edge rides the sparse structure: entry 0 of an isolated
        # node IS its nearest spatial neighbor (push covers the reverse)
        nbr_ok_cc = nbr_ok.at[:, 0].max(isolated)
        labels = connected_components_sparse(nbr_idx, nbr_ok_cc, valid,
                                             cc_rounds)
        safe_labels = jnp.minimum(labels, n - 1)
        sizes = jax.ops.segment_sum(valid.astype(jnp.int32), safe_labels,
                                    num_segments=n)
        kept = valid & (sizes[safe_labels] >= jnp.asarray(min_size,
                                                          jnp.int32))
        # ONE dense assembly pass: fix edges in, pruned nodes' edges out
        fix_full = (isolated[:, None] & (idx[None, :] == nn_idx[:, None])) | (
            isolated[None, :] & (idx[:, None] == nn_idx[None, :]))
        adj = (adj | fix_full) & kept[:, None] & kept[None, :]
    else:
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
        kept = valid & (sizes[safe_labels] >= jnp.asarray(min_size,
                                                          jnp.int32))

        # --- drop edges touching removed nodes ---
        adj = adj & kept[:, None] & kept[None, :]

    # --- reconnect surviving components ---
    if reconnect_impl == "centroid":
        adj = _reconnect_components_centroid(adj, kpts, labels, kept,
                                             buckets=reconnect_buckets)
    else:
        adj = _reconnect_components(adj, kpts, d2, labels, kept,
                                    buckets=reconnect_buckets)
    return AGCGraph(adj=adj, kept=kept, labels=labels, threshold=threshold)


def _diag_band(blocks: jnp.ndarray) -> jnp.ndarray:
    """Extract per-row diagonal bands from block matrices, gather-free.

    blocks: (nb, BR, C) where block b row r holds values f(i, j) for
    i = b*BR + r and j spanning a window starting at column 0 = j0(b) such
    that the wanted offsets sit at local column r + m. Returns
    (nb*BR, Wh = C - BR) with out[i, m] = blocks[b, r, r + m].

    Pure reshape/pad: element (r, r+m) of a flattened (BR, C) block lives
    at r*(C+1) + m, so viewing the (padded) flat buffer as (BR, C+1) rows
    puts every diagonal band in the leading Wh columns.
    """
    nb, br, c = blocks.shape
    wh = c - br
    flat = blocks.reshape(nb, br * c)
    flat = jnp.concatenate(
        [flat, jnp.zeros((nb, br), flat.dtype)], axis=1)
    return flat.reshape(nb, br, c + 1)[:, :, :wh].reshape(nb * br, wh)


def _band_shear_bwd(band: jnp.ndarray) -> jnp.ndarray:
    """Backward view of a forward band: bwd[j, m] = band[j-1-m, m].

    band[i, m] holds edge(i, j=i+1+m); bwd[j, m] holds the same edge seen
    from j. Pure reshape: in the column-major flat buffer, element
    (m, j-1-m) sits at m*(N-1) + (j-1), so re-viewing with row length N-1
    shears every column down by m+1. Entries with j-1-m < 0 (wrap
    garbage) are masked off.
    """
    n, wh = band.shape
    flat = band.T.reshape(-1)                       # (wh*n,)
    part = flat[: wh * (n - 1)].reshape(wh, n - 1)  # [m, j-1]
    bwd = jnp.concatenate(
        [jnp.zeros((wh, 1), band.dtype), part], axis=1).T  # (n, wh)
    j = jnp.arange(n, dtype=jnp.int32)[:, None]
    m = jnp.arange(wh, dtype=jnp.int32)[None, :]
    return bwd & (j - 1 - m >= 0)


def _window_values_fwd(vec: jnp.ndarray, n: int, br: int, wh: int,
                       fill) -> jnp.ndarray:
    """(N,) vector -> (N, Wh) windows out[i, m] = vec[i+1+m] (fill past N).

    Gather-free: one tiny (nb, BR+Wh) row gather of the padded vector per
    block, then the diagonal-band reshape.
    """
    nb = n // br
    c = br + wh
    pad = jnp.concatenate(
        [vec, jnp.full((wh + 1,), fill, vec.dtype)])
    col_idx = (jnp.arange(nb, dtype=jnp.int32) * br + 1)[:, None] \
        + jnp.arange(c, dtype=jnp.int32)[None, :]
    blocks = jnp.broadcast_to(pad[col_idx][:, None, :], (nb, br, c))
    return _diag_band(blocks)


def _window_values_bwd(vec: jnp.ndarray, n: int, br: int, wh: int,
                       fill) -> jnp.ndarray:
    """(N,) vector -> (N, Wh) windows out[j, m] = vec[j-1-m] (fill past 0)."""
    nb = n // br
    c = br + wh
    pad = jnp.concatenate(
        [jnp.full((wh,), fill, vec.dtype), vec])
    col_idx = (jnp.arange(nb, dtype=jnp.int32) * br)[:, None] \
        + jnp.arange(c, dtype=jnp.int32)[None, :]
    blocks = jnp.broadcast_to(pad[col_idx][:, None, :], (nb, br, c))
    return _diag_band(blocks)[:, ::-1]


def connected_components_band(band: jnp.ndarray, valid: jnp.ndarray,
                              rounds: int, br: int = 128) -> jnp.ndarray:
    """Min-label propagation over a forward band edge set.

    Same contract as :func:`connected_components` on the symmetrized
    dense adjacency of `band` (labels = min node id per component,
    sentinel N for invalid nodes), but each round reads O(N*Wh) instead
    of O(N^2): a forward pull (labels of j = i+1+m) and a backward pull
    (labels of i = j-1-m over the sheared band), both built by the
    gather-free window tricks, plus 3 pointer jumps.
    """
    n, wh = band.shape
    sentinel = jnp.int32(n)
    idx = jnp.arange(n, dtype=jnp.int32)
    label0 = jnp.where(valid, idx, sentinel)
    bwd = _band_shear_bwd(band)

    def one_round(label):
        lf = _window_values_fwd(label, n, br, wh, sentinel)
        pulled = jnp.min(jnp.where(band, lf, sentinel), axis=1)
        lb = _window_values_bwd(label, n, br, wh, sentinel)
        pushed = jnp.min(jnp.where(bwd, lb, sentinel), axis=1)
        label = jnp.minimum(label, jnp.minimum(pulled, pushed))
        label = jnp.where(valid, label, sentinel)
        for _ in range(3):
            safe = jnp.minimum(label, n - 1)
            jumped = jnp.where(label < n, label[safe], sentinel)
            label = jnp.minimum(label, jumped)
        return label

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


def _band_to_dense(band: jnp.ndarray, br: int = 128) -> jnp.ndarray:
    """(N, Wh) band with band[i, m] = edge(i, i+1+m) -> dense (N, N) bool.

    Two constructions of the same array:

    * fast path (N % br == 0): per-`br`-row-block inverse shear (the
      (C+1) -> C flat re-view, _diag_band's trick run backwards) followed
      by a GROUP-level flat re-view that lands block b at column b*br —
      the group strides differ by exactly `br`, so every row of the final
      view starts 128-lane-aligned. Measured on v5e at (16, 6144, 512):
      ~5 ms vs ~105 ms for the global-shift construction below (whose two
      full-size re-views are misaligned by one element and lower to
      pathological lane-shift copies).
    * fallback: pad rows to N+1, flatten, shift the whole buffer by one —
      dense flat position of (i, j=i+1+m) is i*(N+1) + m + 1.

    Entries must already be False for j >= N (they would alias).
    """
    n, wh = band.shape
    if n % br == 0 and n > br:
        nb = n // br
        c = br + wh + 128          # block width fits r+1+m for r < br
        w_out = n + c
        rows = band.reshape(nb, br, wh)
        # inverse shear: padded[b, r] = [0, band row r, 0...] of width c+1;
        # flat pos r*(c+1) + (m+1) re-viewed with row length c lands at
        # (r, r+1+m)
        padded = jnp.pad(rows, ((0, 0), (0, 0), (1, c - wh)))
        blocks = padded.reshape(nb, br * (c + 1))[:, : br * c]
        # group placement: rows of length w_out from a buffer whose groups
        # stride br*w_out + br put group b at column offset b*br
        groups = jnp.pad(
            blocks.reshape(nb, br, c), ((0, 0), (0, 0), (0, w_out - c)))
        flat = jnp.pad(groups.reshape(nb, br * w_out), ((0, 0), (0, br)))
        dense = flat.reshape(-1)[: n * w_out].reshape(n, w_out)
        return dense[:, :n]
    padded = jnp.pad(band, ((0, 0), (0, n + 1 - wh))).reshape(-1)
    shifted = jnp.concatenate(
        [jnp.zeros((1,), band.dtype), padded])
    return shifted[: n * n].reshape(n, n)


def build_graph_band(
    kpts: jnp.ndarray,
    descs: jnp.ndarray,
    valid: jnp.ndarray,
    radius: float,
    percentile: float,
    min_size: int,
    cc_rounds: int = 20,
    threshold_stride: int = 4,
    band_halfwidth: int = 512,
    reconnect_impl: str = "centroid",
    reconnect_buckets: int = 1024,
    defer_unpermute: bool = False,
    cc_impl: str = "dense",
) -> AGCGraph:
    """Band-limited AGC: same contract as :func:`build_graph`, O(N*W) build.

    The AGC candidate graph is radius-bounded (reference: agc.py:436
    cKDTree.query_pairs(r=radius)), so after sorting keypoints by x every
    candidate pair sits within a narrow window of sorted indices. All
    O(N^2) f32 materializations (d2, sim) shrink to (N, Wh) bands built
    from MXU block matmuls + reshape tricks (no gathers); only the bool
    adjacency is ever densified (for CC / reconnection / the downstream
    SAGE matmuls). ~6x less HBM traffic than the dense build at the eval
    shape (N=6144, Wh=512).

    Exact vs :func:`build_graph` (threshold_impl="approx", same stride)
    whenever every radius-pair is within `band_halfwidth` sorted positions
    (guaranteed when band_halfwidth >= N-1): the threshold subsample is
    taken in the caller's row order BEFORE the x-sort, so it is
    bit-identical to the dense-approx one. The percentile is always the
    strided approximation — reference-exact ranks need the full (N, N)
    similarity set this variant exists to avoid (stride 1 = exact).
    """
    n_in = kpts.shape[0]
    BR = 128
    n = ((n_in + BR - 1) // BR) * BR
    if n > n_in:
        kpts = jnp.pad(kpts, ((0, n - n_in), (0, 0)),
                       constant_values=2.0e9)
        descs = jnp.pad(descs, ((0, n - n_in), (0, 0)))
        valid = jnp.pad(valid, (0, n - n_in))
    wh = min(int(band_halfwidth), n)
    wh = ((wh + BR - 1) // BR) * BR

    idx = jnp.arange(n, dtype=jnp.int32)

    # --- percentile threshold over a strided row subsample (the dense
    # path's threshold_impl="approx", computed directly as a (N/s, N)
    # matmul instead of slicing a full (N, N) sim matrix). Taken in the
    # CALLER's row order, BEFORE the x-sort, so the threshold is
    # bit-identical to the dense-approx one on the same input ---
    normed_u = descs / jnp.maximum(
        jnp.linalg.norm(descs, axis=1, keepdims=True), 1e-12)
    s = max(int(threshold_stride), 1)
    sub_sim = jnp.matmul(normed_u[::s], normed_u.T,
                         precision=jax.lax.Precision.HIGH)
    rows = idx[::s]
    sub_mask = (valid[::s, None] & valid[None, :]
                & (rows[:, None] < idx[None, :]))
    cnt_sub = jnp.sum(sub_mask.astype(jnp.int32))
    k_sub = jnp.floor(
        cnt_sub.astype(jnp.float32) * jnp.float32(percentile / 100.0)
    ).astype(jnp.int32)
    k_sub = jnp.clip(k_sub, 0, jnp.maximum(cnt_sub - 1, 0))
    threshold = kth_smallest_masked(sub_sim, sub_mask, k_sub,
                                    lo=-1.001, hi=1.001)

    # --- sort by x (padding/invalid rows sort last; ordering is stable) ---
    sort_key = jnp.where(valid, kpts[:, 0], BIG)
    perm = jnp.argsort(sort_key, stable=True)
    inv = jnp.argsort(perm, stable=True)
    kp = kpts[perm]
    va = valid[perm]
    normed = normed_u[perm]

    # --- banded d2 / sim over forward offsets j = i+1+m, m in [0, wh) ---
    nb = n // BR
    c = BR + wh
    # forward column windows: block b covers j in [b*BR + 1, b*BR + c]
    col_idx = (jnp.arange(nb, dtype=jnp.int32) * BR + 1)[:, None] \
        + jnp.arange(c, dtype=jnp.int32)[None, :]
    kp_pad = jnp.pad(kp, ((0, wh + 1), (0, 0)), constant_values=2.0e9)
    va_pad = jnp.pad(va, (0, wh + 1))
    nm_pad = jnp.pad(normed, ((0, wh + 1), (0, 0)))

    kr = kp.reshape(nb, BR, 2)
    nr = normed.reshape(nb, BR, -1)
    kc = kp_pad[col_idx]            # (nb, c, 2)
    vc = va_pad[col_idx]            # (nb, c)
    nc_ = nm_pad[col_idx]           # (nb, c, D)

    sim_blocks = jnp.einsum("brd,bcd->brc", nr, nc_,
                            precision=jax.lax.Precision.HIGH)
    diff = kr[:, :, None, :] - kc[:, None, :, :]
    d2_blocks = jnp.sum(diff * diff, axis=-1)          # (nb, BR, c)
    v_blocks = jnp.broadcast_to(vc[:, None, :], (nb, BR, c))

    sim_b = _diag_band(sim_blocks)                     # (n, wh)
    d2_b = _diag_band(d2_blocks)
    ok_b = _diag_band(v_blocks)

    radius = jnp.asarray(radius, jnp.float32)
    j_fwd = idx[:, None] + 1 + jnp.arange(wh, dtype=jnp.int32)[None, :]
    band = (ok_b & va[:, None] & (j_fwd < n)
            & (d2_b <= radius * radius) & (sim_b >= threshold))

    # --- isolated-node fix: nearest spatial neighbor from the fwd + bwd
    # distance bands (exact when the true NN is within the window, which
    # band_halfwidth >= N-1 guarantees; at eval densities the spatial NN
    # is essentially always a few sorted positions away) ---
    degree = (jnp.sum(band, axis=1)
              + jnp.sum(_band_shear_bwd(band), axis=1))
    has_any_edge = jnp.any(band)
    isolated = va & (degree == 0) & has_any_edge

    # backward windows: block b covers j in [b*BR - wh, b*BR + BR)
    col_idx2 = (jnp.arange(nb, dtype=jnp.int32) * BR)[:, None] \
        + jnp.arange(c, dtype=jnp.int32)[None, :]
    kp_pad2 = jnp.concatenate(
        [jnp.full((wh, 2), 2.0e9, kp.dtype), kp], axis=0)
    va_pad2 = jnp.concatenate([jnp.zeros(wh, bool), va])
    kc2 = kp_pad2[col_idx2]
    vc2 = va_pad2[col_idx2]
    diff2 = kr[:, :, None, :] - kc2[:, None, :, :]
    d2b2 = jnp.sum(diff2 * diff2, axis=-1)
    v2 = jnp.broadcast_to(vc2[:, None, :], (nb, BR, c))
    d2_bwd = _diag_band(d2b2)[:, ::-1]                 # (n, wh): j = i-1-m
    ok_bwd = _diag_band(v2)[:, ::-1]
    j_bwd = idx[:, None] - 1 - jnp.arange(wh, dtype=jnp.int32)[None, :]

    cand_d2 = jnp.concatenate(
        [jnp.where(ok_bwd & (j_bwd >= 0), d2_bwd, BIG),
         jnp.where(ok_b & (j_fwd < n), d2_b, BIG)], axis=1)
    cand_j = jnp.concatenate([j_bwd, j_fwd], axis=1)
    nn_d2 = jnp.min(cand_d2, axis=1)
    # smallest j among ties (dense parity: _first_min_index picks first j)
    nn_idx = jnp.min(
        jnp.where(cand_d2 == nn_d2[:, None], cand_j, n), axis=1)
    nn_ok = isolated & (nn_d2 < BIG) & (nn_idx < n)
    nn_safe = jnp.clip(nn_idx, 0, n - 1)
    # fix edges ride the band (the NN comes from the window by
    # construction): row min(i, nn), forward offset |i - nn| - 1
    r_fix = jnp.minimum(idx, nn_safe)
    off_fix = jnp.abs(idx - nn_safe) - 1
    ok_fix = nn_ok & (off_fix >= 0) & (off_fix < wh)
    band = band.at[r_fix, jnp.clip(off_fix, 0, wh - 1)].max(ok_fix)

    # --- densify the bool adjacency (fix edges included; the dense
    # matrix is the downstream SAGE/compaction contract either way), and
    # label components. cc_impl picks the propagation arena: "dense"
    # reads O(N^2) bool rows per round — measured faster at the 6144
    # bench shape (the band variant's per-round (nb, BR, BR+Wh) int32
    # window materializations cost more than the (N, N) bool row
    # reduce); "band" reads O(N*Wh) per round — the crossover favors it
    # at the 12288 upsampled-devsift shape and beyond.
    adj_half = _band_to_dense(band)
    adj = adj_half | adj_half.T
    if cc_impl == "band":
        labels = connected_components_band(band, va, cc_rounds)
    else:
        labels = connected_components(adj, va, cc_rounds)
    safe_labels = jnp.minimum(labels, n - 1)
    sizes = jax.ops.segment_sum(va.astype(jnp.int32), safe_labels,
                                num_segments=n)
    kept = va & (sizes[safe_labels] >= jnp.asarray(min_size, jnp.int32))
    adj = adj & kept[:, None] & kept[None, :]

    # --- back to the caller's keypoint order BEFORE reconnection:
    # reconnect is enumeration-order- and f32-summation-order-sensitive
    # (component ranks, centroid sums, argmin tie-breaks), so it always
    # runs with CALLER-order vectors, making band reconnection
    # bit-identical to the dense path's. The caller-order vectors (kept,
    # labels) are cheap row gathers; the (N, N) un-permutation of adj is
    # NOT — so with defer_unpermute the matrix stays in sorted space and
    # the caller composes `inv` into its own downstream gather
    # (pipeline._compact_side), while reconnect's two link edges are
    # scattered through inv. Bit-identical either way.
    kept = kept[inv]
    # canonical labels: minimum ORIGINAL node id per component (what the
    # dense path produces directly)
    rep_o = jnp.where(labels < n, perm[jnp.minimum(labels, n - 1)],
                      jnp.int32(n))  # sorted-space rows -> original rep id
    lab_o = rep_o[inv]               # per original row, component rep id
    idx_o = jnp.arange(n, dtype=jnp.int32)
    min_id = jax.ops.segment_min(
        jnp.where(lab_o < n, idx_o, jnp.int32(n)),
        jnp.minimum(lab_o, n - 1), num_segments=n)
    labels = jnp.where(lab_o < n, min_id[jnp.minimum(lab_o, n - 1)],
                       jnp.int32(n)).astype(jnp.int32)

    scatter_map = inv if defer_unpermute else None
    if not defer_unpermute:
        # row-gather + transpose twice: a minor-axis (column) gather on
        # the (N, N) bool matrix lowers to a lane-shift relayout; two
        # aligned row gathers + two transposes are cheaper and
        # bit-identical (B[:, inv] == (B.T[inv]).T)
        adj = jnp.take(jnp.take(adj, inv, axis=0).T, inv, axis=0).T

    if reconnect_impl == "centroid":
        adj = _reconnect_components_centroid(adj, kpts, labels, kept,
                                             buckets=reconnect_buckets,
                                             scatter_map=scatter_map)
    else:
        d2_full = pairwise_sq_dists(kpts)
        adj = _reconnect_components(adj, kpts, d2_full, labels, kept,
                                    buckets=reconnect_buckets,
                                    scatter_map=scatter_map)

    kept_o = kept[:n_in]
    labels_o = jnp.minimum(labels[:n_in], jnp.int32(n_in))
    if defer_unpermute:
        # adj stays (n, n) sorted-space (rows of invalid/pruned nodes are
        # all-False, so composed gathers never need clamping)
        return AGCGraph(adj=adj, kept=kept_o, labels=labels_o,
                        threshold=threshold, inv=inv[:n_in])
    adj_o = adj[:n_in, :n_in]
    return AGCGraph(adj=adj_o, kept=kept_o, labels=labels_o,
                    threshold=threshold)


def band_coverage(kpts: jnp.ndarray, valid: jnp.ndarray, radius: float,
                  band_halfwidth: int) -> dict:
    """Audit the band build's window assumption on one keypoint set.

    Counts the within-`radius` candidate pairs (the dense build's edge
    candidates, reference: agc.py:436) and how many of them fall OUTSIDE
    the sorted-x index window — those are the pairs build_graph_band
    silently drops (AGCConfig density bound). O(N^2) bool work; meant for
    offline audits / tests, not the hot path.

    Returns {"pairs_in_radius", "pairs_outside_window", "coverage"}.
    """
    @jax.jit
    def counts(kpts, valid):
        n = kpts.shape[0]
        d2 = pairwise_sq_dists(kpts)
        idx = jnp.arange(n, dtype=jnp.int32)
        upper = (valid[:, None] & valid[None, :]
                 & (idx[:, None] < idx[None, :]))
        in_radius = upper & (d2 <= jnp.float32(radius) ** 2)
        sort_key = jnp.where(valid, kpts[:, 0], BIG)
        rank = jnp.argsort(jnp.argsort(sort_key, stable=True), stable=True)
        gap = jnp.abs(rank[:, None] - rank[None, :])
        outside = in_radius & (gap > band_halfwidth)
        return jnp.sum(in_radius), jnp.sum(outside)

    total, out = jax.device_get(counts(kpts, valid))
    return {
        "pairs_in_radius": int(total),
        "pairs_outside_window": int(out),
        "coverage": float(1.0 - out / total) if total > 0 else 1.0,
    }


def _component_links_head(kpts, labels, kept, C):
    """Shared head of both reconnect variants: rank-compacted component ids,
    centroids, each component's nearest component, and the link skip rule.

    Labels are rank-compacted to C dense component ids so the
    per-component tables are (C+1, N) instead of (n+1, N) — several
    times less HBM traffic at eval scale. Rank order equals label order,
    so the enumeration-order-dependent skip rule is unchanged. (If a
    degenerate graph exceeds C components, the overflow components share
    the last bucket: their links may merge; nothing crashes.)
    """
    n = kpts.shape[0]
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
    return lab, comp_ids, cent, nnc_safe, link_ok, nnc


def _reconnect_components(adj, kpts, d2, labels, kept, buckets=4096,
                          scatter_map=None):
    """Reference: agc.py:518-565 `fast_connect_components`.

    Single pass: each surviving component links to its nearest component by
    centroid distance through the closest node pair. A link (i, j) is
    skipped when (j, i) was already made earlier in the pass; enumeration
    order is ascending component label (= ascending min node id, matching
    networkx's connected_components order for nodes inserted 0..N-1).
    """
    n = kpts.shape[0]
    C = min(n, int(buckets))
    lab, comp_ids, _, nnc_safe, link_ok, nnc = _component_links_head(
        kpts, labels, kept, C)

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

    # two tiny scatters into adj itself — a zeros_like + | + .T costs three
    # full (N, N) bool passes plus a transpose (~15 ms/batch at the bench
    # shape); the in-place form is free. scatter_map routes the caller-id
    # link endpoints into a sorted-space adj (band defer_unpermute mode).
    if scatter_map is not None:
        u_l_safe = scatter_map[u_l_safe]
        v_l_safe = scatter_map[v_l_safe]
    return (adj.at[u_l_safe, v_l_safe].max(ok)
            .at[v_l_safe, u_l_safe].max(ok))


def _reconnect_components_centroid(adj, kpts, labels, kept, buckets=1024,
                                   scatter_map=None):
    """Approximate reconnect for the TPU fast path.

    Same link topology as :func:`_reconnect_components` (nearest component
    by centroid distance, ascending-label enumeration, reverse-link skip),
    but the link ENDPOINTS are picked through centroids instead of the
    exact closest node pair: v* = the target component's node nearest to
    OUR centroid, u* = our node nearest to v*. This removes the exact
    variant's dominant cost — the (C+1, N) segment_min over the full d2
    matrix — leaving only (C+1, N) coordinate-distance tables built from
    2-D points (MXU matmuls). The added edge still connects the same
    component pair; only which node pair carries it can differ.
    """
    n = kpts.shape[0]
    C = min(n, int(buckets))
    lab, comp_ids, cent, nnc_safe, link_ok, nnc = _component_links_head(
        kpts, labels, kept, C)

    k2 = jnp.sum(kpts * kpts, axis=1)                      # (N,)
    c2 = jnp.sum(cent * cent, axis=1)                      # (C+1,)
    # dt[l, v] = ||cent[l] - kpts[v]||^2
    dt = c2[:, None] - 2.0 * (cent @ kpts.T) + k2[None, :]  # (C+1, N)
    tgt_mask = (lab[None, :] == nnc_safe[:, None]) & kept[None, :]
    _, v_l = _first_min_index(dt, tgt_mask, axis=1)         # sentinel n
    v_l_safe = jnp.minimum(v_l, n - 1)

    pv = kpts[v_l_safe]                                     # (C+1, 2)
    # du[u, l] = ||kpts[u] - kpts[v*(l)]||^2
    du = k2[:, None] - 2.0 * (kpts @ pv.T) + jnp.sum(pv * pv, axis=1)[None, :]
    src_mask = (lab[:, None] == comp_ids[None, :]) & kept[:, None]
    _, u_l = _first_min_index(du, src_mask, axis=0)         # sentinel n
    u_l_safe = jnp.minimum(u_l, n - 1)
    ok = link_ok & (v_l < n) & (u_l < n)

    if scatter_map is not None:
        u_l_safe = scatter_map[u_l_safe]
        v_l_safe = scatter_map[v_l_safe]
    return (adj.at[u_l_safe, v_l_safe].max(ok)
            .at[v_l_safe, u_l_safe].max(ok))


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
