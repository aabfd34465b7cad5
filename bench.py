#!/usr/bin/env python
"""Headline benchmark: matched pairs/sec at 800x600 end-to-end.

Mirrors the reference's headline scenario (BASELINE.md: matcher latency
14.2-17.2 s/pair on an RTX 3090 => ~0.0637 pairs/s) with the published
eval knobs: sinkhorn_iterations=20, match_threshold=0.02, AGC r=15/p=2/m=7
(reference: eval_homography.py:113-124). Images are synthetic textured
pairs (the environment ships no datasets); keypoint counts are capped at
12288 to pin one compile bucket, matching the reference's ~15k-keypoint
regime.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

import json
import sys
import time

BASELINE_PAIRS_PER_SEC = 1.0 / 15.7  # mid of 14.2-17.2 s/pair


def make_images(n_pairs, h=600, w=800):
    import cv2
    import numpy as np

    pairs = []
    for i in range(n_pairs):
        rng = np.random.RandomState(1000 + i)
        img = rng.randint(0, 255, (h // 4, w // 4, 3)).astype("uint8")
        img = cv2.resize(img, (w, h), interpolation=cv2.INTER_CUBIC)
        img = cv2.GaussianBlur(img, (0, 0), 1.2)
        angle = rng.uniform(-15, 15)
        M = cv2.getRotationMatrix2D((w / 2, h / 2), angle,
                                    rng.uniform(0.85, 1.1))
        H = np.eye(3, dtype=np.float32)
        H[:2] = M
        warped = cv2.warpPerspective(img, H, (w, h))
        pairs.append((img, warped))
    return pairs


def main():
    t_start = time.time()
    try:
        import numpy as np
        import jax

        # persistent compile cache: first-ever run pays remote-compile cost,
        # every later bench run replays executables
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

        from gims_tpu.api import Matching

        import os

        variables = None
        synth_weights = os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "weights", "gims_tpu_synth.npz",
        )
        if os.path.exists(synth_weights):
            from gims_tpu.core.checkpoint import unflatten_npz

            variables = unflatten_npz(synth_weights)
        matcher = Matching(variables=variables, config={
            "sinkhorn_iterations": 20,
            "match_threshold": 0.02,
            "max_keypoints": 12288,
            # bf16 runs the 18-layer attention trunk 2.1x faster on the
            # MXU; Sinkhorn/score/extraction stay f32
            "attention_dtype": "bfloat16",
            # linear taps + direct 32x32 sampling: 12x fewer gather rows
            "fast_frontend": True,
            # streaming double-buffered Pallas OT kernel (1.5x the XLA loop)
            "use_pallas_sinkhorn": True,
        })

        pairs = make_images(13)
        agc = {"radius": 15, "percentile": 2, "min_size": 7}

        def run(pair, feats=None):
            img0, img1 = pair
            data = {
                "image0": img0[None], "image1": img1[None], **agc,
                "return_descriptors": False,
            }
            if feats is not None:
                data["features"] = feats
            return matcher(data)

        # warmup / compile (three pairs cover all octave/bucket kernels)
        for p in pairs[:3]:
            run(p)

        # Pipelined timing: a worker thread runs the host-side frontend of
        # pair i+1 (SIFT detect + async device dispatch) while the main
        # thread finishes pair i's matcher download.
        from concurrent.futures import ThreadPoolExecutor

        timed = pairs[3:]
        total_matches = 0
        with ThreadPoolExecutor(max_workers=1) as pool:
            t0 = time.perf_counter()
            fut = pool.submit(matcher.prepare_features, timed[0], agc)
            for i, p in enumerate(timed):
                feats = fut.result()
                if i + 1 < len(timed):
                    fut = pool.submit(
                        matcher.prepare_features, timed[i + 1], agc
                    )
                pred = run(p, feats)
                total_matches += int((pred["matches0"][0] > -1).sum())
            elapsed = time.perf_counter() - t0
        fps = len(timed) / elapsed

        import jax

        out = {
            "metric": "matched_pairs_per_sec_800x600",
            "value": round(fps, 4),
            "unit": "pairs/s",
            "vs_baseline": round(fps / BASELINE_PAIRS_PER_SEC, 2),
            "pairs_timed": len(timed),
            "sec_per_pair": round(elapsed / len(timed), 4),
            "avg_matches": total_matches // max(len(timed), 1),
            "backend": jax.devices()[0].platform,
            "timings_last_pair": {
                k: round(v, 4) for k, v in matcher.timings.items()
            },
            "total_wall_s": round(time.time() - t_start, 1),
        }
    except Exception as e:  # noqa: BLE001
        import traceback

        traceback.print_exc(file=sys.stderr)
        out = {
            "metric": "matched_pairs_per_sec_800x600",
            "value": 0.0,
            "unit": "pairs/s",
            "vs_baseline": 0.0,
            "error": f"{type(e).__name__}: {e}",
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
