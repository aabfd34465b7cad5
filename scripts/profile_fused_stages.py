#!/usr/bin/env python
"""Device-time decomposition of the fused program at the bench knobs.

Times four separately-jitted programs on the real backend (sync forced by
a scalar readout — block_until_ready is unreliable through the axon
tunnel):

  extract   vmapped _extract_side over both sides of the batch
            (pyramid + DoG detection + dense CNN + descriptor sampling)
  agc       run_agc on the stacked extract outputs (threshold + CC)
  matcher   full forward_match (AGC + compaction + trunk + OT + extract)
  full      the shipping fused_match_batch program (bench.py's dispatch)

trunk+OT ~= matcher - agc; stage sums differ from `full` by fusion across
stage boundaries (XLA overlaps extract with AGC when they share one
program), so `full` is the ground truth and the splits are the levers.

Env knobs mirror bench.py: GIMS_BENCH_{BATCH,KPTS,COMPACT,TOPK,THRESH,
FMO,UPSAMPLE}.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def sync_time(fn, *args, reps=5):
    import jax
    import jax.numpy as jnp

    out = fn(*args)  # compile
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
    from gims_tpu import fused as F
    from gims_tpu.core.checkpoint import unflatten_npz
    from gims_tpu.fused import FusedMatching
    from gims_tpu.matcher import pipeline

    batch = int(os.environ.get("GIMS_BENCH_BATCH", "8"))
    pairs = bench.make_images(batch)
    g0 = np.stack([cv2.cvtColor(a, cv2.COLOR_BGR2GRAY) for a, _ in pairs])
    g1 = np.stack([cv2.cvtColor(b, cv2.COLOR_BGR2GRAY) for _, b in pairs])

    desc = os.environ.get("GIMS_BENCH_DESC", "dense_gray")
    variables = car_variables = None
    weight_names = (("gims_tpu_sift_last.npz",) if desc == "devsift" else
                    ("gims_tpu_dense_gray_e2e.npz",
                     "gims_tpu_dense_gray_ft800.npz",
                     "gims_tpu_dense_gray.npz"))
    for name in weight_names:
        p = os.path.join("weights", name)
        if os.path.exists(p):
            variables = unflatten_npz(p)
            carp = p.replace(".npz", "_car.npz")
            if os.path.exists(carp):
                car_variables = unflatten_npz(carp)
            print(f"weights: {name} (car: {car_variables is not None})")
            break
    m = FusedMatching({
        "sinkhorn_iterations": 20, "match_threshold": 0.02,
        "attention_dtype": "bfloat16",
        # devsift default off: the Pallas sinkhorn faults the TPU worker
        # on rare pair compositions inside the batched upsampled devsift
        # program (see matcher/pallas_sinkhorn.py)
        "use_pallas_sinkhorn": os.environ.get(
            "GIMS_BENCH_PALLAS_SINKHORN",
            "0" if desc == "devsift" else "1") == "1",
        "fast_frontend": True, "descriptor_source": desc,
        "init_scheme": "identity",
        "upsample": os.environ.get("GIMS_BENCH_UPSAMPLE", "0") == "1",
        "topk_impl": os.environ.get("GIMS_BENCH_TOPK", "approx"),
        "threshold_impl": os.environ.get("GIMS_BENCH_THRESH", "approx"),
        "dense_first_map_oct": int(os.environ.get("GIMS_BENCH_FMO", "1")),
        "radius": 15, "percentile": 2, "min_size": 7,
        **({"compact_to": int(os.environ["GIMS_BENCH_COMPACT"])}
           if "GIMS_BENCH_COMPACT" in os.environ else {}),
    }, variables=variables, car_variables=car_variables,
        total_keypoints=int(os.environ.get("GIMS_BENCH_KPTS", "6144")))

    h, w = int(g0.shape[1]), int(g0.shape[2])
    budgets = F.octave_budgets(h, w, m.total, m.fe.upsample)
    from gims_tpu.frontend.detect_device import build_gray_blur

    blur = build_gray_blur(h, w, m.fe.upsample)
    d0 = jax.device_put(g0)
    d1 = jax.device_put(g1)
    jax.block_until_ready((d0, d1))

    @jax.jit
    def extract_both(a, b):
        def one(im):
            return F._extract_side(im, h, w, budgets, m.fe, m.car_variables,
                                   m.car_model, m.dense_model, blur)
        return jax.vmap(one)(a), jax.vmap(one)(b)

    print(f"batch={batch} kpts={m.total} compact={m.compact_to} "
          f"fmo={m.fe.dense_first_map_oct} upsample={m.fe.upsample}",
          flush=True)

    def report(name, t):
        print(f"{name:28s} {1e3 * t:8.1f} ms/batch "
              f"({1e3 * t / batch:6.1f} ms/pair)", flush=True)

    t_ex = sync_time(extract_both, d0, d1)
    report("extract (both sides)", t_ex)
    (kp0, sc0, va0, de0), (kp1, sc1, va1, de1) = jax.block_until_ready(
        extract_both(d0, d1))

    @jax.jit
    def agc_only(kp0, de0, va0, kp1, de1, va1):
        return pipeline.run_agc(
            jnp.concatenate([kp0, kp1]), jnp.concatenate([de0, de1]),
            jnp.concatenate([va0, va1]), m.acfg)

    t_agc = sync_time(agc_only, kp0, de0, va0, kp1, de1, va1)
    report("agc", t_agc)

    @jax.jit
    def matcher_fn(variables, kp0, de0, va0, kp1, de1, va1, sc0, sc1):
        return pipeline.forward_match(
            variables, m.mcfg, m.acfg, kp0, de0, va0, kp1, de1, va1,
            image_shape=(h, w), compact_to=m.compact_to,
            scores0=sc0, scores1=sc1)

    def run_matcher():
        return matcher_fn(m.variables, kp0, de0, va0, kp1, de1, va1,
                          sc0, sc1)

    t_mat = sync_time(run_matcher)
    report("matcher (agc+trunk+OT)", t_mat)
    report("  trunk+OT ~= matcher-agc", t_mat - t_agc)

    def run_full():
        return m.dispatch_batch(d0, d1)

    t_full = sync_time(run_full)
    report("full fused program", t_full)
    report("  stage sum ex+matcher", t_ex + t_mat)


if __name__ == "__main__":
    main()
