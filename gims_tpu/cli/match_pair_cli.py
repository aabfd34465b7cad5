"""Minimum end-to-end slice: match two images and dump/visualize matches
(SURVEY.md §7 'match_pair.py')."""

from __future__ import annotations

import argparse

import cv2
import numpy as np


def main(argv=None):
    from gims_tpu.core.cache import enable_persistent_cache
    enable_persistent_cache()
    parser = argparse.ArgumentParser()
    parser.add_argument("image0")
    parser.add_argument("image1")
    parser.add_argument("--weights_path", type=str, default=None)
    parser.add_argument("--out", type=str, default="matches.png")
    parser.add_argument("--npz", type=str, default=None)
    parser.add_argument("--sinkhorn_iterations", type=int, default=20)
    parser.add_argument("--match_threshold", type=float, default=0.02)
    parser.add_argument("--agc_r", type=float, default=15)
    parser.add_argument("--agc_p", type=float, default=2)
    parser.add_argument("--agc_m", type=int, default=7)
    parser.add_argument("--descriptor_source", type=str, default="carhynet",
                        choices=["carhynet", "sift", "dense", "dense_gray",
                                 "devsift"])
    parser.add_argument("--fast", action="store_true")
    parser.add_argument("--fused", action="store_true",
                        help="single-program pipeline (gims_tpu/fused.py): "
                             "on-device detection, one dispatch per pair")
    parser.add_argument("--total_keypoints", type=int, default=12288,
                        help="--fused keypoint budget")
    args = parser.parse_args(argv)

    from gims_tpu.eval.viz import draw_matches

    img0 = cv2.imread(args.image0, cv2.IMREAD_COLOR)
    img1 = cv2.imread(args.image1, cv2.IMREAD_COLOR)
    if args.fused:
        from gims_tpu.fused import FusedMatching

        variables = None
        if args.weights_path:
            from gims_tpu.matcher.convert import load_gims_checkpoint

            variables = load_gims_checkpoint(args.weights_path)
        matcher = FusedMatching({
            "sinkhorn_iterations": args.sinkhorn_iterations,
            "match_threshold": args.match_threshold,
            "descriptor_source": args.descriptor_source,
            "radius": args.agc_r, "percentile": args.agc_p,
            "min_size": args.agc_m,
            **({"attention_dtype": "bfloat16", "use_pallas_sinkhorn": True,
                "fast_frontend": True} if args.fast else {}),
        }, variables=variables, total_keypoints=args.total_keypoints)
        pred = matcher(img0, img1)
    else:
        from gims_tpu.api import Matching

        matcher = Matching({
            "weights_path": args.weights_path,
            "sinkhorn_iterations": args.sinkhorn_iterations,
            "match_threshold": args.match_threshold,
            "max_keypoints": -1,
            "descriptor_source": args.descriptor_source,
            **({"attention_dtype": "bfloat16", "use_pallas_sinkhorn": True,
                "fast_frontend": True} if args.fast else {}),
        })
        pred = matcher({
            "image0": img0[None], "image1": img1[None],
            "radius": args.agc_r, "percentile": args.agc_p,
            "min_size": args.agc_m,
        })
    kpts0 = pred["keypoints0"][0]
    kpts1 = pred["keypoints1"][0]
    matches = pred["matches0"][0]
    valid = matches > -1
    print(f"keypoints: {len(kpts0)} / {len(kpts1)}; "
          f"matches: {int(valid.sum())}")
    print("timings:", {k: round(v, 3) for k, v in matcher.timings.items()})
    if args.npz:
        np.savez(args.npz, keypoints0=kpts0, keypoints1=kpts1,
                 matches=matches,
                 match_confidence=pred["matching_scores0"][0])
    viz = draw_matches(img0, img1, kpts0[valid], kpts1[matches[valid]])
    cv2.imwrite(args.out, viz)


if __name__ == "__main__":
    main()
