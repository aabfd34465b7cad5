#!/usr/bin/env python
"""Micro-decomposition of the devsift fused EXTRACT stage.

VERDICT r4 task 1 follow-through: the fused devsift config (the one whose
n199 record beats the reference's published real-photo row) is
extract-bound (profile_fused_stages: 316 ms/pair upsampled, 247 of which
is keypoint-count-independent). This script times the per-octave pieces
separately — pyramid blurs, DoG candidate maps, orientation maps,
gradient quad rows, descriptor chunks — to find the lever.

Env: GIMS_BENCH_UPSAMPLE (default 1), GIMS_BENCH_BATCH (default 8).
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
    from gims_tpu.frontend.sift_descriptor import grad_levels

    batch = int(os.environ.get("GIMS_BENCH_BATCH", "8"))
    upsample = os.environ.get("GIMS_BENCH_UPSAMPLE", "1") == "1"
    pairs = bench.make_images(batch)
    g0 = np.stack([cv2.cvtColor(a, cv2.COLOR_BGR2GRAY) for a, _ in pairs])
    h, w = int(g0.shape[1]), int(g0.shape[2])
    blur = DD.build_gray_blur(h, w, upsample)
    d0 = jax.device_put(g0)
    jax.block_until_ready(d0)

    def report(name, t):
        print(f"{name:34s} {1e3 * t:8.1f} ms/batch "
              f"({1e3 * t / batch:6.1f} ms/pair-side)", flush=True)

    pyr_fn = jax.jit(jax.vmap(
        lambda im: DD.gray_pyramid(im, h, w, blur, upsample)))
    t = sync_time(pyr_fn, d0)
    report("gray pyramid (all octaves)", t)
    octs = jax.block_until_ready(pyr_fn(d0))

    for o, gauss in enumerate(octs):
        oh, ow = int(gauss.shape[2]), int(gauss.shape[3])
        tag = f"oct{o}[{oh}x{ow}]"

        ori_fn = jax.jit(jax.vmap(DD._orientation_maps))
        t_ori = sync_time(ori_fn, gauss)
        report(f"{tag} orientation maps", t_ori)

        def cand(gs):
            ori = DD._orientation_maps(gs)
            return DD._octave_candidates(gs, 0.001, 80.0, ori)

        t_cand = sync_time(jax.jit(jax.vmap(cand)), gauss)
        report(f"{tag} candidates (incl ori)", t_cand)

        gq_fn = jax.jit(jax.vmap(
            lambda gs: quad_rows_from_levels(grad_levels(gs))))
        t_gq = sync_time(gq_fn, gauss)
        report(f"{tag} gradient quad rows", t_gq)

        if o > 1:
            break


if __name__ == "__main__":
    main()
