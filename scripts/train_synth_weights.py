#!/usr/bin/env python
"""Train GMatcher on synthetic homography pairs and export weights.

Produces weights/gims_tpu_synth.npz (flat-pytree npz) that bench.py and
Matching(...) can load. This is a capability/throughput demonstration
model — real quality numbers require COCO2017 (see train.py).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=800)
    parser.add_argument("--pairs", type=int, default=300)
    parser.add_argument("--out", type=str, default="weights/gims_tpu_synth.npz")
    parser.add_argument("--image_hw", type=int, nargs=2, default=[480, 640])
    args = parser.parse_args()

    import dataclasses

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    from gims_tpu.config import GIMSConfig, TrainConfig, DatasetConfig
    from gims_tpu.core.checkpoint import save_npz
    from gims_tpu.train.data import SyntheticPairDataset
    from gims_tpu.train.loop import train

    cfg = GIMSConfig(
        dataset=DatasetConfig(image_height=args.image_hw[0],
                              image_width=args.image_hw[1],
                              apply_color_aug=False),
        train=TrainConfig(num_epochs=100, batch_size=1, max_keypoints=2048,
                          val_images_count=4, log_interval=20,
                          minloss_every=100, lastiter_every=500),
    )
    ds = SyntheticPairDataset(cfg.dataset, length=args.pairs, seed=0)
    val = SyntheticPairDataset(cfg.dataset, length=4, seed=777)
    state = train(cfg, train_dataset=ds, val_dataset=val,
                  save_dir="output/train/synth", max_steps=args.steps,
                  fast_frontend=True)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    save_npz(args.out, {"params": state.params,
                        "batch_stats": state.batch_stats})
    print(f"saved {args.out}")


if __name__ == "__main__":
    main()
