#!/usr/bin/env python
"""Microbench: flash (lax.scan) vs Pallas fused attention at eval scale.

Usage: python scripts/bench_attention.py [--n 12288] [--repeats 5]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=12288)
    ap.add_argument("--heads", type=int, default=4)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--block_q", type=int, default=512)
    ap.add_argument("--block_k", type=int, default=512)
    ap.add_argument("--loops", type=int, default=36,
                    help="attention calls chained inside one jit (like the "
                         "18-layer x 2-side trunk); amortizes the ~29 ms "
                         "axon RPC readout floor")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    import jax.numpy as jnp

    from gims_tpu.matcher.attention import masked_attention_flash
    from gims_tpu.matcher.pallas_attention import masked_attention_pallas

    b, n, h, d = 1, args.n, args.heads, args.dim
    dt = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(b, n, h, d), dt)
    k = jnp.asarray(rng.randn(b, n, h, d), dt)
    v = jnp.asarray(rng.randn(b, n, h, d), dt)
    mask = jnp.asarray(rng.rand(b, n) < 0.9)

    loops = args.loops

    def chain(attn):
        # feed each call's output back as q: the chain cannot be CSE'd
        def fn(q, k, v, mask):
            def body(i, cur):
                out = attn(cur, k, v, mask)
                return out + 1e-6 * i
            return jax.lax.fori_loop(0, loops, body, q)
        return jax.jit(fn)

    flash = chain(masked_attention_flash)
    pallas = chain(lambda *a: masked_attention_pallas(
        *a, block_q=args.block_q, block_k=args.block_k))

    def timeit(name, fn):
        out = fn(q, k, v, mask)
        _ = np.asarray(out[0, 0, 0, 0])  # host readout (axon-safe sync)
        ts = []
        for _i in range(args.repeats):
            t0 = time.perf_counter()
            out = fn(q, k, v, mask)
            _ = np.asarray(out[0, 0, 0, 0])
            ts.append(time.perf_counter() - t0)
        per = (min(ts) - 0.029) / loops  # subtract the RPC readout floor
        print(f"{name:10s} best {min(ts)*1e3:8.2f} ms total, "
              f"~{per*1e3:6.2f} ms/call  "
              f"{['%.1f' % (t*1e3) for t in ts]}")
        return out, per

    of, tf = timeit("flash", flash)
    op, tp = timeit("pallas", pallas)
    diff = np.max(np.abs(
        np.asarray(of, np.float32) - np.asarray(op, np.float32)
    ))
    print(f"max |flash - pallas| = {diff:.4g}; speedup {tf / tp:.2f}x")


if __name__ == "__main__":
    main()
