#!/usr/bin/env python
"""Devsift extract decomposition AT the tuned operating point.

profile_devsift_extract.py times the building blocks in their *fallback*
forms (depthwise-conv orientation maps, f32 quad tables) and never times
the descriptor gathers at all — so its numbers do not decompose the
shipped fused program (which uses the MXU banded-matmul orientation path,
bf16 gradient tables, and spends most of its extract time in the
per-keypoint S^2 quad-row gathers). This script times each piece exactly
as fused._extract_side composes it:

  pyramid        gray_pyramid with the band-matrix blur pytree
  ori(mats)      _orientation_maps with blur["ori"][o] (bf16 MXU)
  cand           _octave_candidates given precomputed ori maps
  topk           approx_max_k over the octave score plane
  quad(bf16)     grad_levels -> bf16 quad_rows_from_levels
  desc chunk     one compiled _descr_chunk (DESC_CHUNK x S^2 gathers)

Per-octave budgets mirror octave_budgets(600, 800, 12288, upsample=True)
= (10176, 1536, 384, 96, 48, 32, ...): octave 0 holds ~83% of the
keypoints, so its S^2-row gathers are the extract's dominant term.

Env: GIMS_BENCH_BATCH (default 4 — the devsift bench batch),
GIMS_BENCH_SAMPLES (default 12 — the tuned grid).
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
    from gims_tpu.fused import octave_budgets

    batch = int(os.environ.get("GIMS_BENCH_BATCH", "4"))
    s_grid = int(os.environ.get("GIMS_BENCH_SAMPLES", "12"))
    pairs = bench.make_images(batch)
    g0 = np.stack([cv2.cvtColor(a, cv2.COLOR_BGR2GRAY) for a, _ in pairs])
    h, w = int(g0.shape[1]), int(g0.shape[2])
    budgets = octave_budgets(h, w, 12288, True)
    print(f"batch={batch} S={s_grid} budgets={budgets}", flush=True)
    blur = DD.build_gray_blur(h, w, True)
    d0 = jax.device_put(g0)
    jax.block_until_ready(d0)

    def report(name, t):
        print(f"{name:34s} {1e3 * t:8.1f} ms/batch "
              f"({1e3 * t / batch:6.2f} ms/pair-side)", flush=True)

    pyr_fn = jax.jit(jax.vmap(
        lambda im: DD.gray_pyramid(im, h, w, blur, True)))
    t = sync_time(pyr_fn, d0)
    report("gray pyramid (mats, all octaves)", t)
    octs = jax.block_until_ready(pyr_fn(d0))

    rng = np.random.RandomState(0)
    total_ori = total_cand = total_topk = total_quad = total_desc = 0.0
    for o, gauss in enumerate(octs):
        if o > 2:
            break
        oh, ow = int(gauss.shape[2]), int(gauss.shape[3])
        tag = f"oct{o}[{oh}x{ow}]"
        mats = blur["ori"][o]

        ori_fn = jax.jit(jax.vmap(lambda g: DD._orientation_maps(g, mats)))
        t_ori = sync_time(ori_fn, gauss)
        report(f"{tag} ori maps (MXU mats)", t_ori)
        total_ori += t_ori
        ori = jax.block_until_ready(ori_fn(gauss))

        cand_fn = jax.jit(jax.vmap(
            lambda g, a: DD._octave_candidates(g, 0.001, 80.0, a)))
        t_cand = sync_time(cand_fn, gauss, ori)
        report(f"{tag} candidates (given ori)", t_cand)
        total_cand += t_cand
        cand = jax.block_until_ready(cand_fn(gauss, ori))

        k_o = min(budgets[o], 3 * oh * ow)

        topk_fn = jax.jit(jax.vmap(lambda sc: jax.lax.approx_max_k(
            sc.reshape(-1), k_o, recall_target=0.95)))
        t_topk = sync_time(topk_fn, cand["score"])
        report(f"{tag} approx top-{k_o}", t_topk)
        total_topk += t_topk

        quad_fn = jax.jit(jax.vmap(
            lambda g: quad_rows_from_levels(
                grad_levels(g).astype(jnp.bfloat16))))
        t_quad = sync_time(quad_fn, gauss)
        report(f"{tag} quad rows (bf16)", t_quad)
        total_quad += t_quad
        gq = jax.block_until_ready(quad_fn(gauss))

        # descriptor chunks: k_o keypoints rounded up to DESC_CHUNK units,
        # realistic coords/scales (uniform interior, layer-1..3 scl range)
        nchunks = -(-k_o // DESC_CHUNK)
        lv = jnp.asarray(rng.randint(0, 3, (DESC_CHUNK,)).astype(np.int32))
        px = jnp.asarray(rng.uniform(8, ow - 8, DESC_CHUNK).astype(np.float32))
        py = jnp.asarray(rng.uniform(8, oh - 8, DESC_CHUNK).astype(np.float32))
        scl = jnp.asarray(rng.uniform(1.6, 3.2, DESC_CHUNK).astype(np.float32))
        ang = jnp.asarray(rng.uniform(0, 360, DESC_CHUNK).astype(np.float32))
        val = jnp.ones((DESC_CHUNK,), jnp.float32)

        chunk_fn = jax.jit(jax.vmap(
            lambda q: _descr_chunk(q, oh, ow, lv, px, py, scl, ang, val,
                                   s_grid)))
        t_chunk = sync_time(chunk_fn, gq)
        rows = batch * DESC_CHUNK * s_grid * s_grid
        t_desc = t_chunk * nchunks
        report(f"{tag} desc gathers x{nchunks} chunks", t_desc)
        print(f"{'':34s} ({rows / t_chunk / 1e6:8.1f} M rows/s/chunk)",
              flush=True)
        total_desc += t_desc

    per_side = (t + total_ori + total_cand + total_topk + total_quad
                + total_desc) / batch
    print(f"\nsum oct0-2 per pair-side: {1e3 * per_side:.1f} ms "
          f"(ori {1e3 * total_ori / batch:.1f}, cand "
          f"{1e3 * total_cand / batch:.1f}, topk "
          f"{1e3 * total_topk / batch:.1f}, quad "
          f"{1e3 * total_quad / batch:.1f}, desc "
          f"{1e3 * total_desc / batch:.1f})", flush=True)


if __name__ == "__main__":
    main()
