#!/usr/bin/env python
"""Dispatch-floor-corrected devsift extract probes.

profile_devsift_extract2.py's per-piece timings each include one
dispatch + scalar-readout RPC through the axon tunnel (~27 ms at batch
4 — its smallest op times cluster there), so small pieces read as equal.
This script (a) measures the RPC floor with a trivial program, (b) times
the oct0 quad-table build and the full 10-chunk descriptor-gather loop
INSIDE one jitted program each — the composition fused._extract_side
actually uses — and (c) times quad build variants to find whether the
(L*(h+1)*(w+1), 8) flatten layout is the cost.
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
    import cv2
    import jax.numpy as jnp

    import bench
    from gims_tpu.frontend import detect_device as DD
    from gims_tpu.frontend.patches import quad_rows_from_levels
    from gims_tpu.frontend.sift_descriptor import (
        DESC_CHUNK,
        _descr_chunk,
        grad_levels,
    )

    batch = int(os.environ.get("GIMS_BENCH_BATCH", "4"))
    s_grid = int(os.environ.get("GIMS_BENCH_SAMPLES", "12"))
    pairs = bench.make_images(batch)
    g0 = np.stack([cv2.cvtColor(a, cv2.COLOR_BGR2GRAY) for a, _ in pairs])
    h, w = int(g0.shape[1]), int(g0.shape[2])
    blur = DD.build_gray_blur(h, w, True)
    d0 = jax.device_put(g0)
    jax.block_until_ready(d0)

    def report(name, t):
        print(f"{name:40s} {1e3 * t:8.1f} ms/batch "
              f"({1e3 * t / batch:6.2f} ms/pair-side)", flush=True)

    t_floor = sync_time(jax.jit(lambda x: x + 1.0), jnp.float32(0.0))
    print(f"dispatch+readout RPC floor: {1e3 * t_floor:.1f} ms", flush=True)

    pyr_fn = jax.jit(jax.vmap(
        lambda im: DD.gray_pyramid(im, h, w, blur, True)))
    octs = jax.block_until_ready(pyr_fn(d0))
    gauss = octs[0]                      # (B, 6, 1200, 1600)
    oh, ow = int(gauss.shape[2]), int(gauss.shape[3])

    # quad build variants, one program each
    def quad_flat(g):
        return quad_rows_from_levels(grad_levels(g).astype(jnp.bfloat16))

    t = sync_time(jax.jit(jax.vmap(quad_flat)), gauss)
    report("oct0 quad rows bf16 (shipped flatten)", t)

    def quad_4d(g):
        lv = grad_levels(g).astype(jnp.bfloat16)
        p = jnp.pad(lv, ((0, 0), (1, 1), (1, 1), (0, 0)))
        hh, ww = lv.shape[1], lv.shape[2]
        return jnp.concatenate(
            [p[:, 0:hh + 1, 0:ww + 1], p[:, 0:hh + 1, 1:ww + 2],
             p[:, 1:hh + 2, 0:ww + 1], p[:, 1:hh + 2, 1:ww + 2]], axis=-1)

    t = sync_time(jax.jit(jax.vmap(quad_4d)), gauss)
    report("oct0 quad rows bf16 (no flatten)", t)

    def grads_only(g):
        return grad_levels(g).astype(jnp.bfloat16)

    t = sync_time(jax.jit(jax.vmap(grads_only)), gauss)
    report("oct0 grad_levels only", t)

    # descriptor gathers: all 10 chunks inside ONE program (fused layout)
    rng = np.random.RandomState(0)
    k_o = 10 * DESC_CHUNK
    lv = jnp.asarray(rng.randint(0, 3, (k_o,)).astype(np.int32))
    px = jnp.asarray(rng.uniform(8, ow - 8, k_o).astype(np.float32))
    py = jnp.asarray(rng.uniform(8, oh - 8, k_o).astype(np.float32))
    scl = jnp.asarray(rng.uniform(1.6, 3.2, k_o).astype(np.float32))
    ang = jnp.asarray(rng.uniform(0, 360, k_o).astype(np.float32))
    val = jnp.ones((k_o,), jnp.float32)

    def desc_all(g):
        gq = quad_flat(g)
        outs = []
        for i in range(10):
            s = slice(i * DESC_CHUNK, (i + 1) * DESC_CHUNK)
            outs.append(_descr_chunk(gq, oh, ow, lv[s], px[s], py[s],
                                     scl[s], ang[s], val[s], s_grid))
        return jnp.concatenate(outs)

    t = sync_time(jax.jit(jax.vmap(desc_all)), gauss)
    report("oct0 quad + 10 desc chunks (one prog)", t)

    def desc_one_take(g):
        gq = quad_flat(g)
        outs = []
        for i in range(10):
            s = slice(i * DESC_CHUNK, (i + 1) * DESC_CHUNK)
            outs.append(_descr_chunk(gq, oh, ow, lv[s], px[s], py[s],
                                     scl[s], ang[s], val[s], s_grid))
        return jnp.concatenate(outs)

    # single 10240-keypoint chunk (no 1024 chunking) for comparison
    def desc_single(g):
        gq = quad_flat(g)
        return _descr_chunk(gq, oh, ow, lv, px, py, scl, ang, val, s_grid)

    t = sync_time(jax.jit(jax.vmap(desc_single)), gauss)
    report("oct0 quad + one 10240-kp chunk", t)


if __name__ == "__main__":
    main()
