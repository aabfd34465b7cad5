#!/usr/bin/env python
"""Stage-level matcher profile at the bench bucket (12288 kpts, 800x600).

Times, with host readouts (block_until_ready lies on axon — see
axon-tpu-performance-laws):
  - full forward_match (the bench's matcher program)
  - AGC alone (batched 2, stacked pair)
  - cosine sim + percentile threshold alone
  - connected components alone
  - GNN trunk + Sinkhorn + extraction alone (precomputed adjacency)

Usage: python scripts/profile_matcher.py [--bucket 12288] [--repeats 5]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def readout(x):
    import jax.numpy as jnp

    leaves = __import__("jax").tree_util.tree_leaves(x)
    return float(jnp.sum(leaves[0].astype(jnp.float32)))


def timeit(fn, repeats):
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn()
        readout(out)
        ts.append(time.perf_counter() - t0)
    return min(ts), ts


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bucket", type=int, default=12288)
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--n_valid", type=int, default=11000)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    import jax.numpy as jnp

    from gims_tpu.config import AGCConfig, MatcherConfig
    from gims_tpu.api import init_gmatcher_variables
    from gims_tpu.agc import graph as agc_graph
    from gims_tpu.matcher import pipeline, sinkhorn
    from gims_tpu.matcher.gmatcher import GMatcher, normalize_keypoints

    # clamp the valid count to the bucket: --bucket 6144 with the default
    # --n_valid 11000 must profile a full bucket, not crash (VERDICT r4
    # weak #5 — the r4 operating-point profile silently failed here)
    nb = args.bucket
    nv = min(args.n_valid, nb)
    mcfg = MatcherConfig(
        sinkhorn_iterations=20, match_threshold=0.02,
        attention_dtype="bfloat16", use_pallas_sinkhorn=True,
    )
    acfg = AGCConfig(radius=15.0, percentile=2.0, min_size=7)
    variables = jax.device_put(init_gmatcher_variables(mcfg))

    rng = np.random.RandomState(0)
    kp = np.full((2, nb, 2), 1e6, np.float32)
    kp[:, :nv] = rng.rand(2, nv, 2).astype(np.float32) * [800, 600]
    de = rng.randn(2, nb, 256).astype(np.float32) * 0.1
    va = np.zeros((2, nb), bool)
    va[:, :nv] = True
    kp, de, va = jnp.asarray(kp), jnp.asarray(de), jnp.asarray(va)
    kk = jnp.asarray(
        [pipeline.percentile_rank(nv, acfg.percentile)] * 2, np.int32
    )
    radius = jnp.float32(acfg.radius)
    min_size = jnp.int32(acfg.min_size)

    report = {}

    # --- full forward (mirrors api._jit_forward exactly minus knob plumb) ---
    @jax.jit
    def full(kp, de, va, kk, radius, min_size):
        return pipeline.forward_match(
            variables, mcfg, acfg, kp[:1], de[:1], va[:1],
            kp[1:], de[1:], va[1:], (600, 800),
            k0=kk[:1], k1=kk[1:], radius=radius, min_size=min_size,
        )

    t0 = time.perf_counter()
    out = full(kp, de, va, kk, radius, min_size)
    readout(out["matches0"])
    print(f"full: first call (compile) {time.perf_counter()-t0:.1f}s")
    best, ts = timeit(
        lambda: full(kp, de, va, kk, radius, min_size)["matches0"],
        args.repeats)
    report["full_forward"] = best
    print(f"full_forward      {best*1e3:8.1f} ms  {ts}")

    # --- AGC alone (batched 2, like the stacked-pair path) ---
    @jax.jit
    def agc_only(kp, de, va, kk, radius, min_size):
        adj, kept, _ = pipeline.run_agc(kp, de, va, acfg, kk, radius, min_size)
        return kept

    agc_only(kp, de, va, kk, radius, min_size)
    best, ts = timeit(lambda: agc_only(kp, de, va, kk, radius, min_size),
                      args.repeats)
    report["agc"] = best
    print(f"agc (batch 2)     {best*1e3:8.1f} ms  {ts}")

    # --- sim + threshold alone (batched 2) ---
    @jax.jit
    def thr_only(de, va, kk):
        def one(d, v, k):
            n = d.shape[0]
            idx = jnp.arange(n, dtype=jnp.int32)
            sim = agc_graph.cosine_similarity_matrix(d)
            triu = (v[:, None] & v[None, :]) & (idx[:, None] < idx[None, :])
            return agc_graph.kth_smallest_masked(
                sim, triu, k, lo=-1.001, hi=1.001)
        return jax.vmap(one)(de, va, kk)

    thr_only(de, va, kk)
    best, ts = timeit(lambda: thr_only(de, va, kk), args.repeats)
    report["sim_threshold"] = best
    print(f"sim+threshold (2) {best*1e3:8.1f} ms  {ts}")

    # --- sim matrix alone (batched 2) ---
    @jax.jit
    def sim_only(de):
        return jax.vmap(agc_graph.cosine_similarity_matrix)(de).sum(
            axis=(1, 2))

    sim_only(de)
    best, ts = timeit(lambda: sim_only(de), args.repeats)
    report["sim_matmul"] = best
    print(f"sim matmul (2)    {best*1e3:8.1f} ms  {ts}")

    # --- CC alone on the AGC adjacency ---
    adj_dev, kept_dev, _ = jax.jit(
        lambda kp, de, va, kk, r, m: pipeline.run_agc(kp, de, va, acfg, kk,
                                                      r, m)
    )(kp, de, va, kk, radius, min_size)
    readout(kept_dev)

    @jax.jit
    def cc_only(adj, va):
        return jax.vmap(
            lambda a, v: agc_graph.connected_components(a, v, acfg.cc_rounds)
        )(adj, va)

    cc_only(adj_dev, va)
    best, ts = timeit(lambda: cc_only(adj_dev, va), args.repeats)
    report["connected_components"] = best
    print(f"cc (2, {acfg.cc_rounds} rounds) {best*1e3:8.1f} ms  {ts}")

    # --- trunk (GNN + Sinkhorn + extraction) with precomputed adjacency ---
    @jax.jit
    def trunk_only(kp, de, adj, kept):
        k0n = normalize_keypoints(kp[:1], 600, 800, mcfg.normalization)
        k1n = normalize_keypoints(kp[1:], 600, 800, mcfg.normalization)
        out = GMatcher(mcfg).apply(
            variables, k0n, de[:1], adj[:1], kept[:1],
            k1n, de[1:], adj[1:], kept[1:], train=False,
        )
        ext = sinkhorn.extract_matches(
            out["Z"], kept[:1], kept[1:], mcfg.match_threshold)
        return ext["matches0"]

    trunk_only(kp, de, adj_dev, kept_dev)
    best, ts = timeit(lambda: trunk_only(kp, de, adj_dev, kept_dev),
                      args.repeats)
    report["trunk_gnn_ot"] = best
    print(f"trunk (gnn+ot)    {best*1e3:8.1f} ms  {ts}")

    # --- GNN trunk only (Sinkhorn iterations = 0) ---
    mcfg0 = MatcherConfig(
        sinkhorn_iterations=0, match_threshold=0.02,
        attention_dtype="bfloat16", use_pallas_sinkhorn=False,
    )

    @jax.jit
    def gnn_only(kp, de, adj, kept):
        k0n = normalize_keypoints(kp[:1], 600, 800, mcfg0.normalization)
        k1n = normalize_keypoints(kp[1:], 600, 800, mcfg0.normalization)
        out = GMatcher(mcfg0).apply(
            variables, k0n, de[:1], adj[:1], kept[:1],
            k1n, de[1:], adj[1:], kept[1:], train=False,
        )
        return out["Z"]

    gnn_only(kp, de, adj_dev, kept_dev)
    best, ts = timeit(lambda: gnn_only(kp, de, adj_dev, kept_dev),
                      args.repeats)
    report["gnn_no_ot"] = best
    print(f"gnn (no OT)       {best*1e3:8.1f} ms  {ts}")

    # --- attention alone estimate: see scripts/bench_attention.py ---

    print({k: round(v * 1e3, 1) for k, v in report.items()})


if __name__ == "__main__":
    main()
