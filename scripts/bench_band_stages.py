#!/usr/bin/env python
"""Band-AGC sub-stage device timing at the bench shape (2B x N).

The shipping TPU default is agc_impl="band" (gims_tpu/fused.py); this
decomposes build_graph_band into separately-jitted cumulative prefixes:

  threshold   strided sub-similarity matmul + multisection k-th smallest
  band        ... + x-sort + banded d2/sim blocks + candidate band
  cc          ... + isolated fix + densify + dense CC + min_size prune
  full        the shipping build_graph_band (+ centroid reconnect)

Env: GIMS_BENCH_BATCH (default 8 pairs -> 16 items), GIMS_BENCH_KPTS,
GIMS_BENCH_BANDW (halfwidth, default 512).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def sync_time(fn, *args, reps=5):
    import jax
    import jax.numpy as jnp

    out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(leaf.astype(jnp.float32)))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(jnp.sum(leaf.astype(jnp.float32)))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    import jax.numpy as jnp

    from gims_tpu.agc import graph as G

    batch = 2 * int(os.environ.get("GIMS_BENCH_BATCH", "8"))
    n = int(os.environ.get("GIMS_BENCH_KPTS", "6144"))
    wh = int(os.environ.get("GIMS_BENCH_BANDW", "512"))
    radius, percentile, min_size, stride = 15.0, 2.0, 7, 4

    rng = np.random.RandomState(0)
    kpts = jnp.asarray(
        rng.uniform(0, 800, (batch, n, 2)).astype(np.float32))
    descs = jnp.asarray(rng.randn(batch, n, 256).astype(np.float32))
    valid = jnp.asarray(
        np.arange(n)[None, :] < rng.randint(n * 3 // 4, n, (batch, 1)))

    def threshold_one(kp, de, va):
        idx = jnp.arange(n, dtype=jnp.int32)
        normed = de / jnp.maximum(
            jnp.linalg.norm(de, axis=1, keepdims=True), 1e-12)
        sub_sim = jnp.matmul(normed[::stride], normed.T,
                             precision=jax.lax.Precision.HIGH)
        rows = idx[::stride]
        sub_mask = (va[::stride, None] & va[None, :]
                    & (rows[:, None] < idx[None, :]))
        cnt = jnp.sum(sub_mask.astype(jnp.int32))
        k = jnp.clip(
            jnp.floor(cnt.astype(jnp.float32)
                      * jnp.float32(percentile / 100.0)).astype(jnp.int32),
            0, jnp.maximum(cnt - 1, 0))
        return G.kth_smallest_masked(sub_sim, sub_mask, k,
                                     lo=-1.001, hi=1.001)

    def band_one(kp, de, va):
        # the build up to the candidate band (copy of build_graph_band's
        # first half, minus CC/reconnect)
        thr = threshold_one(kp, de, va)
        BR = 128
        sort_key = jnp.where(va, kp[:, 0], G.BIG)
        perm = jnp.argsort(sort_key, stable=True)
        kp_s = kp[perm]
        va_s = va[perm]
        normed = de / jnp.maximum(
            jnp.linalg.norm(de, axis=1, keepdims=True), 1e-12)
        nm = normed[perm]
        nb = n // BR
        c = BR + wh
        col_idx = (jnp.arange(nb, dtype=jnp.int32) * BR + 1)[:, None] \
            + jnp.arange(c, dtype=jnp.int32)[None, :]
        kp_pad = jnp.pad(kp_s, ((0, wh + 1), (0, 0)), constant_values=2e9)
        va_pad = jnp.pad(va_s, (0, wh + 1))
        nm_pad = jnp.pad(nm, ((0, wh + 1), (0, 0)))
        kr = kp_s.reshape(nb, BR, 2)
        nr = nm.reshape(nb, BR, -1)
        kc = kp_pad[col_idx]
        vc = va_pad[col_idx]
        nc_ = nm_pad[col_idx]
        sim_blocks = jnp.einsum("brd,bcd->brc", nr, nc_,
                                precision=jax.lax.Precision.HIGH)
        diff = kr[:, :, None, :] - kc[:, None, :, :]
        d2_blocks = jnp.sum(diff * diff, axis=-1)
        v_blocks = jnp.broadcast_to(vc[:, None, :], (nb, BR, c))
        sim_b = G._diag_band(sim_blocks)
        d2_b = G._diag_band(d2_blocks)
        ok_b = G._diag_band(v_blocks)
        idx = jnp.arange(n, dtype=jnp.int32)
        j_fwd = idx[:, None] + 1 + jnp.arange(wh, dtype=jnp.int32)[None, :]
        r = jnp.asarray(radius, jnp.float32)
        band = (ok_b & va_s[:, None] & (j_fwd < n)
                & (d2_b <= r * r) & (sim_b >= thr))
        return band

    def cc_one(kp, de, va):
        band = band_one(kp, de, va)
        adj_half = G._band_to_dense(band)
        adj = adj_half | adj_half.T
        labels = G.connected_components(adj, va, 20)
        safe = jnp.minimum(labels, n - 1)
        sizes = jax.ops.segment_sum(va.astype(jnp.int32), safe,
                                    num_segments=n)
        kept = va & (sizes[safe] >= jnp.asarray(min_size, jnp.int32))
        return adj & kept[:, None] & kept[None, :], kept

    def full_one(kp, de, va):
        return G.build_graph_band(
            kp, de, va, radius=radius, percentile=percentile,
            min_size=min_size, threshold_stride=stride,
            band_halfwidth=wh, reconnect_impl="centroid",
            reconnect_buckets=1024)

    names = [("threshold", jax.jit(jax.vmap(threshold_one))),
             ("+band build", jax.jit(jax.vmap(band_one))),
             ("+densify+cc+prune", jax.jit(jax.vmap(cc_one))),
             ("full (+reconnect)", jax.jit(jax.vmap(full_one)))]
    npairs = batch // 2
    print(f"items={batch} n={n} wh={wh} stride={stride}", flush=True)
    prev = 0.0
    for name, fn in names:
        t = sync_time(fn, kpts, descs, valid)
        print(f"{name:22s} {1e3 * t:8.1f} ms/batch "
              f"({1e3 * t / npairs:6.1f} ms/pair)  "
              f"[marginal {1e3 * (t - prev):6.1f}]", flush=True)
        prev = t


if __name__ == "__main__":
    main()
