#!/usr/bin/env python
"""Split the fused-path wall time into upload / device / readout.

Builds FusedMatching exactly like bench.run_fused (same env knobs:
GIMS_BENCH_KPTS/BATCH/COMPACT/TOPK/THRESH/UPSAMPLE), then times each leg
separately at the bench batch size:

  upload   host->device device_put of a (B, H, W) uint8 batch, blocked
  device   dispatch_batch on PRE-UPLOADED buffers, block_until_ready
  readout  collect_batch host transfer + decode of a ready output
  e2e      the bench.py loop shape (uploads on a worker thread, two
           batches in flight) — what `python bench.py` measures

The gap between e2e and max(upload, device) is pipeline slack; whichever
of upload/device is largest is the lever that matters next.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def med(f, n=5):
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        f()
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def main():
    import jax
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    import bench

    batch = int(os.environ.get("GIMS_BENCH_BATCH", "8"))
    pairs = bench.make_images(5 * batch)
    import cv2

    gray = [(cv2.cvtColor(a, cv2.COLOR_BGR2GRAY),
             cv2.cvtColor(b, cv2.COLOR_BGR2GRAY)) for a, b in pairs]

    # identical construction to the bench default
    os.environ.setdefault("GIMS_BENCH_PHOTOS", "0")
    from gims_tpu.core.checkpoint import unflatten_npz
    from gims_tpu.fused import FusedMatching

    variables = car_variables = None
    for name in ("gims_tpu_dense_gray_e2e.npz", "gims_tpu_dense_gray_ft800.npz",
                 "gims_tpu_dense_gray.npz"):
        p = os.path.join("weights", name)
        if os.path.exists(p):
            variables = unflatten_npz(p)
            carp = p.replace(".npz", "_car.npz")
            if os.path.exists(carp):
                car_variables = unflatten_npz(carp)
            print(f"weights: {name} (car: {car_variables is not None})")
            break
    matcher = FusedMatching({
        "sinkhorn_iterations": 20, "match_threshold": 0.02,
        "attention_dtype": "bfloat16", "use_pallas_sinkhorn": True,
        "fast_frontend": True, "descriptor_source": "dense_gray",
        "init_scheme": "identity",
        "upsample": os.environ.get("GIMS_BENCH_UPSAMPLE", "0") == "1",
        "topk_impl": os.environ.get("GIMS_BENCH_TOPK", "approx"),
        "threshold_impl": os.environ.get("GIMS_BENCH_THRESH", "approx"),
        "dense_first_map_oct": int(os.environ.get("GIMS_BENCH_FMO", "0")),
        "radius": 15, "percentile": 2, "min_size": 7,
        **({"compact_to": int(os.environ["GIMS_BENCH_COMPACT"])}
           if "GIMS_BENCH_COMPACT" in os.environ else {}),
    }, variables=variables, car_variables=car_variables,
        total_keypoints=int(os.environ.get("GIMS_BENCH_KPTS", "6144")))

    b0 = np.stack([g[0] for g in gray[:batch]])
    b1 = np.stack([g[1] for g in gray[:batch]])

    # compile + first upload
    out = matcher.dispatch_batch(b0, b1)
    matcher.collect_batch(out)

    mb = (b0.nbytes + b1.nbytes) / 1e6
    t_up = med(lambda: jax.block_until_ready(
        (jax.device_put(b0), jax.device_put(b1))))
    d0, d1 = jax.device_put(b0), jax.device_put(b1)
    jax.block_until_ready((d0, d1))
    t_dev = med(lambda: jax.block_until_ready(matcher.dispatch_batch(d0, d1)))
    ready = matcher.dispatch_batch(d0, d1)
    jax.block_until_ready(ready)
    t_read = med(lambda: matcher.collect_batch(ready))

    n, elapsed, _ = bench._time_fused(matcher, gray, gray=False, batch=batch)
    print(f"batch={batch}  kpts={matcher.total}  compact={matcher.compact_to}"
          f"  upsample={matcher.fe.upsample}")
    print(f"upload  {1e3 * t_up:8.1f} ms/batch ({1e3 * t_up / batch:6.1f} ms"
          f"/pair)  [{mb:.1f} MB -> {mb / t_up:.1f} MB/s]")
    print(f"device  {1e3 * t_dev:8.1f} ms/batch ({1e3 * t_dev / batch:6.1f}"
          f" ms/pair)")
    print(f"readout {1e3 * t_read:8.1f} ms/batch ({1e3 * t_read / batch:6.1f}"
          f" ms/pair)")
    print(f"e2e     {1e3 * elapsed / n * batch:8.1f} ms/batch "
          f"({1e3 * elapsed / n:6.1f} ms/pair = {n / elapsed:.2f} pairs/s)")


if __name__ == "__main__":
    main()
