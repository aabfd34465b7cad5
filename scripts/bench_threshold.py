#!/usr/bin/env python
"""Micro-bench: percentile-threshold formulations at N=12288.

Variants:
  multisection fanout in {64, 16, 8}
  old 34-pass bisection
  single count pass (per-pass floor)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    import jax.numpy as jnp
    from gims_tpu.agc import graph as G

    n, nv = 12288, 11000
    rng = np.random.RandomState(0)
    de = jnp.asarray(rng.randn(2, n, 256).astype(np.float32) * 0.1)
    va = np.zeros((2, n), bool)
    va[:, :nv] = True
    va = jnp.asarray(va)
    k = jnp.asarray([int(nv * (nv - 1) // 2 * 0.02)] * 2, np.int32)

    def mk(passes, fanout):
        @jax.jit
        def f(de, va, k):
            def one(d, v, kk):
                idx = jnp.arange(n, dtype=jnp.int32)
                sim = G.cosine_similarity_matrix(d)
                triu = (v[:, None] & v[None, :]) & (idx[:, None] < idx[None, :])
                return G.kth_smallest_masked(
                    sim, triu, kk, -1.001, 1.001, passes=passes,
                    fanout=fanout)
            return jax.vmap(one)(de, va, k)
        return f

    def timeit(f, *args):
        out = f(*args)
        float(jnp.sum(out))
        ts = []
        for _ in range(4):
            t0 = time.perf_counter()
            float(jnp.sum(f(*args)))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    results = {}
    for passes, fanout in [(6, 64), (9, 16), (12, 8), (17, 4), (34, 2)]:
        t = timeit(mk(passes, fanout), de, va, k)
        results[f"p{passes}_f{fanout}"] = round(t * 1e3, 1)
        print(f"passes={passes:3d} fanout={fanout:3d}: {t*1e3:8.1f} ms")

    # floor: one count pass over sim (compare + global sum)
    @jax.jit
    def one_pass(de, va):
        def one(d, v):
            idx = jnp.arange(n, dtype=jnp.int32)
            sim = G.cosine_similarity_matrix(d)
            triu = (v[:, None] & v[None, :]) & (idx[:, None] < idx[None, :])
            return jnp.sum(((sim <= 0.1) & triu).astype(jnp.int32))
        return jax.vmap(one)(de, va)

    t = timeit(one_pass, de, va)
    print(f"sim + 1 count pass : {t*1e3:8.1f} ms")

    # sim alone
    @jax.jit
    def sim_alone(de):
        return jax.vmap(G.cosine_similarity_matrix)(de).sum((1, 2))

    t0 = timeit(sim_alone, de)
    print(f"sim alone          : {t0*1e3:8.1f} ms")
    print(results)


if __name__ == "__main__":
    main()
