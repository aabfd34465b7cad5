#!/usr/bin/env python
"""AGC sub-stage device timing at the bench shape (2B x N).

Times cumulative prefixes of build_graph as separate jitted programs:
  simthr   d2 + cosine sim + percentile threshold + candidate adjacency
  +cc      ... + isolated fix + connected components + min_size pruning
  full     ... + component reconnection (the shipping build_graph)

Env: GIMS_BENCH_BATCH (default 8 pairs -> 16 items), GIMS_BENCH_KPTS.
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
    from gims_tpu.config import AGCConfig

    batch = 2 * int(os.environ.get("GIMS_BENCH_BATCH", "8"))
    n = int(os.environ.get("GIMS_BENCH_KPTS", "6144"))
    acfg = AGCConfig(radius=15.0, percentile=2.0, min_size=7,
                     threshold_impl="approx", threshold_stride=4)

    rng = np.random.RandomState(0)
    kpts = jnp.asarray(
        rng.uniform(0, 800, (batch, n, 2)).astype(np.float32))
    descs = jnp.asarray(rng.randn(batch, n, 256).astype(np.float32))
    valid = jnp.asarray(
        np.arange(n)[None, :] < rng.randint(n * 3 // 4, n, (batch, 1)))

    def simthr_one(kp, de, va):
        idx = jnp.arange(n, dtype=jnp.int32)
        pair_valid = va[:, None] & va[None, :]
        off_diag = idx[:, None] != idx[None, :]
        d2 = G.pairwise_sq_dists(kp)
        sim = G.cosine_similarity_matrix(de)
        triu = pair_valid & (idx[:, None] < idx[None, :])
        s = acfg.threshold_stride
        sim_sub = sim[::s]
        mask_sub = triu[::s]
        cnt_sub = jnp.sum(mask_sub.astype(jnp.int32))
        k_sub = jnp.floor(cnt_sub.astype(jnp.float32)
                          * jnp.float32(acfg.percentile / 100.0)).astype(
            jnp.int32)
        k_sub = jnp.clip(k_sub, 0, jnp.maximum(cnt_sub - 1, 0))
        threshold = G.kth_smallest_masked(sim_sub, mask_sub, k_sub,
                                          lo=-1.001, hi=1.001)
        r = jnp.asarray(acfg.radius, jnp.float32)
        within = d2 <= r * r
        adj = pair_valid & off_diag & within & (sim >= threshold)
        return adj

    def cc_one(kp, de, va):
        adj = simthr_one(kp, de, va)
        idx = jnp.arange(n, dtype=jnp.int32)
        d2 = G.pairwise_sq_dists(kp)
        pair_valid = va[:, None] & va[None, :]
        off_diag = idx[:, None] != idx[None, :]
        degree = jnp.sum(adj, axis=1)
        has_any_edge = jnp.any(adj)
        isolated = va & (degree == 0) & has_any_edge
        _, nn_idx = G._first_min_index(d2, pair_valid & off_diag, axis=1)
        nn_idx = jnp.minimum(nn_idx, n - 1)
        fix = jnp.zeros_like(adj).at[idx, nn_idx].max(isolated)
        adj = adj | fix | fix.T
        labels = G.connected_components(adj, va, acfg.cc_rounds)
        safe_labels = jnp.minimum(labels, n - 1)
        sizes = jax.ops.segment_sum(va.astype(jnp.int32), safe_labels,
                                    num_segments=n)
        kept = va & (sizes[safe_labels] >= jnp.asarray(acfg.min_size,
                                                       jnp.int32))
        adj = adj & kept[:, None] & kept[None, :]
        return adj, kept

    full_one = lambda kp, de, va: G.build_graph(
        kp, de, va, radius=acfg.radius, percentile=acfg.percentile,
        min_size=acfg.min_size, cc_rounds=acfg.cc_rounds,
        threshold_impl=acfg.threshold_impl,
        threshold_stride=acfg.threshold_stride)

    simthr = jax.jit(jax.vmap(simthr_one))
    cc = jax.jit(jax.vmap(cc_one))
    full = jax.jit(jax.vmap(full_one))

    t1 = sync_time(simthr, kpts, descs, valid)
    t2 = sync_time(cc, kpts, descs, valid)
    t3 = sync_time(full, kpts, descs, valid)
    npairs = batch // 2
    print(f"items={batch} n={n} stride={acfg.threshold_stride}")
    for name, t in [("sim+threshold+adj", t1),
                    ("  +isolated+cc+prune", t2),
                    ("    cc marginal", t2 - t1),
                    ("full (+reconnect)", t3),
                    ("    reconnect marginal", t3 - t2)]:
        print(f"{name:24s} {1e3 * t:8.1f} ms/batch "
              f"({1e3 * t / npairs:6.1f} ms/pair)")


if __name__ == "__main__":
    main()

def fine():
    """Finer split inside the cc marginal: isolated-fix vs while_loop vs prune."""
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    import jax.numpy as jnp
    from gims_tpu.agc import graph as G
    from gims_tpu.config import AGCConfig

    batch = 2 * int(os.environ.get("GIMS_BENCH_BATCH", "8"))
    n = int(os.environ.get("GIMS_BENCH_KPTS", "6144"))
    acfg = AGCConfig(radius=15.0, percentile=2.0, min_size=7,
                     threshold_impl="approx", threshold_stride=4)
    rng = np.random.RandomState(0)
    kpts = jnp.asarray(rng.uniform(0, 800, (batch, n, 2)).astype(np.float32))
    descs = jnp.asarray(rng.randn(batch, n, 256).astype(np.float32))
    valid = jnp.asarray(np.arange(n)[None, :] < rng.randint(n*3//4, n, (batch, 1)))

    # materialize adjacency once (realistic structure)
    def simthr_one(kp, de, va):
        idx = jnp.arange(n, dtype=jnp.int32)
        pair_valid = va[:, None] & va[None, :]
        off_diag = idx[:, None] != idx[None, :]
        d2 = G.pairwise_sq_dists(kp)
        sim = G.cosine_similarity_matrix(de)
        triu = pair_valid & (idx[:, None] < idx[None, :])
        s = acfg.threshold_stride
        cnt_sub = jnp.sum(triu[::s].astype(jnp.int32))
        k_sub = jnp.clip(jnp.floor(cnt_sub.astype(jnp.float32) * jnp.float32(0.02)).astype(jnp.int32), 0, jnp.maximum(cnt_sub-1, 0))
        threshold = G.kth_smallest_masked(sim[::s], triu[::s], k_sub, lo=-1.001, hi=1.001)
        within = d2 <= 15.0*15.0
        return pair_valid & off_diag & within & (sim >= threshold)

    adj = jax.jit(jax.vmap(simthr_one))(kpts, descs, valid)
    adj.block_until_ready()
    # degree stats
    deg = jnp.sum(adj, axis=2)
    print("degree: mean %.1f max %d" % (float(jnp.mean(deg.astype(jnp.float32))), int(jnp.max(deg))))

    def isofix_one(adj1, kp, va):
        idx = jnp.arange(n, dtype=jnp.int32)
        d2 = G.pairwise_sq_dists(kp)
        pair_valid = va[:, None] & va[None, :]
        off_diag = idx[:, None] != idx[None, :]
        degree = jnp.sum(adj1, axis=1)
        isolated = va & (degree == 0) & jnp.any(adj1)
        _, nn_idx = G._first_min_index(d2, pair_valid & off_diag, axis=1)
        nn_idx = jnp.minimum(nn_idx, n - 1)
        fix = jnp.zeros_like(adj1).at[idx, nn_idx].max(isolated)
        return adj1 | fix | fix.T

    def cc_only_one(adj1, va):
        return G.connected_components(adj1, va, acfg.cc_rounds)

    def prune_one(labels, va, adj1):
        safe = jnp.minimum(labels, n - 1)
        sizes = jax.ops.segment_sum(va.astype(jnp.int32), safe, num_segments=n)
        kept = va & (sizes[safe] >= 7)
        return adj1 & kept[:, None] & kept[None, :]

    isofix = jax.jit(jax.vmap(isofix_one))
    cc_only = jax.jit(jax.vmap(cc_only_one))
    labels = cc_only(adj, valid)
    prune = jax.jit(jax.vmap(prune_one))

    t_iso = sync_time(isofix, adj, kpts, valid)
    t_cc = sync_time(cc_only, adj, valid)
    t_pr = sync_time(prune, labels, valid, adj)
    npairs = batch // 2
    for name, t in [("isolated-fix", t_iso), ("cc while_loop", t_cc), ("prune", t_pr)]:
        print(f"{name:16s} {1e3*t:8.1f} ms/batch ({1e3*t/npairs:6.1f} ms/pair)")


if __name__ == "__main__" and os.environ.get("GIMS_AGC_FINE"):
    fine()
