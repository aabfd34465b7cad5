"""Match-count eval CLI (reference eval_matches.py __main__ behavior)."""

from __future__ import annotations

import argparse


def main(argv=None):
    from gims_tpu.core.cache import enable_persistent_cache
    enable_persistent_cache()
    parser = argparse.ArgumentParser()
    parser.add_argument("--image0", type=str, required=True)
    parser.add_argument("--image1", type=str, required=True,
                        help="path or glob of comparison image(s)")
    parser.add_argument("--root_path", type=str, default="./output/match/")
    parser.add_argument("--weights_path", type=str, default=None)
    parser.add_argument("--dgims", action="store_true")
    parser.add_argument("--save_match", action="store_true")
    args = parser.parse_args(argv)

    from gims_tpu.eval.matches import run_match_eval

    run_match_eval(
        args.image0, args.image1, root_path=args.root_path,
        dgims=args.dgims, save_match=args.save_match,
        weights_path=args.weights_path,
    )


if __name__ == "__main__":
    main()
