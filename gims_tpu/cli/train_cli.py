"""Training CLI — flag parity with reference train.py:212-231."""

from __future__ import annotations

import argparse
import glob
import os
import re
from pathlib import Path

from gims_tpu.config import load_config


def increment_path(path, exist_ok=True, sep=""):
    """Reference: utils/common.py:76-86."""
    path = Path(path)
    if (path.exists() and exist_ok) or (not path.exists()):
        return str(path)
    dirs = glob.glob(f"{path}{sep}*")
    matches = [re.search(rf"%s{sep}(\d+)" % path.stem, d) for d in dirs]
    i = [int(m.groups()[0]) for m in matches if m]
    n = max(i) + 1 if i else 2
    return f"{path}{sep}{n}"


def resolve_save_dir(base, restore_path):
    """Run-dir choice: version a fresh run (reference utils/common.py:76-86
    yolo-style), but RESUME IN PLACE when --restore_path points inside the
    run dir itself — otherwise a crash-resume silently forks a `<name>2`
    dir and every later checkpoint lands away from where tooling
    (export/promote scripts) looks.
    """
    base = Path(base)
    if restore_path is not None:
        try:
            restore = Path(restore_path).resolve()
            if restore.is_relative_to(base.resolve()):
                return str(base)
            # also resume in place inside an already-versioned sibling
            # (--name e2e --restore_path output/train/e2e2/weights/last
            # must continue in e2e2, not fork e2e3 — ADVICE r4)
            for sib in sorted(base.parent.glob(base.name + "*")):
                if (re.fullmatch(re.escape(base.name) + r"\d+", sib.name)
                        and restore.is_relative_to(sib.resolve())):
                    return str(sib)
        except (OSError, ValueError):
            pass
    return increment_path(base, exist_ok=False)


def main(argv=None):
    from gims_tpu.core.cache import enable_persistent_cache
    enable_persistent_cache()
    # long-running entry point: make hangs debuggable (SIGUSR2 dumps all
    # Python stacks to stderr without killing the process)
    import faulthandler
    import signal

    faulthandler.enable()
    faulthandler.register(signal.SIGUSR2, all_threads=True)

    parser = argparse.ArgumentParser(description="GIMS-TPU training")
    parser.add_argument("--config_path", type=str,
                        default="configs/coco_config.yaml")
    parser.add_argument("--name", type=str, default="gims")
    parser.add_argument("--limit", type=int, default=-1)
    parser.add_argument("--devices", type=int, default=1,
                        help="data-parallel device count (mesh over ICI)")
    parser.add_argument("--coordinator", type=str, default=None,
                        help="multi-host DP: process-0 'host:port' for "
                             "jax.distributed.initialize (one launch per "
                             "host; mesh spans every host's devices)")
    parser.add_argument("--num_processes", type=int, default=1)
    parser.add_argument("--process_id", type=int, default=0)
    parser.add_argument("--max_steps", type=int, default=-1)
    parser.add_argument("--carhynet_weights", type=str, default=None)
    parser.add_argument("--restore_path", type=str, default=None)
    parser.add_argument("--init_weights", type=str, default=None,
                        help="warm-start model params from an exported npz "
                             "(fresh optimizer/schedule; for fine-tuning)")
    parser.add_argument("--fast", action="store_true",
                        help="fast TPU frontend (linear 32x32 sampling)")
    parser.add_argument("--descriptor_source", type=str, default="carhynet",
                        choices=["carhynet", "sift", "dense", "dense_gray"])
    parser.add_argument("--neg_cells", type=str, default=None,
                        choices=["corner", "dustbin"],
                        help="'corner' = reference loss parity (negatives "
                             "carry no gradient); 'dustbin' = corrected "
                             "negative supervision")
    parser.add_argument("--init_scheme", type=str, default=None,
                        choices=["default", "identity"],
                        help="'identity' = zero-residual warm start: the "
                             "trunk starts as the identity and scores as "
                             "scaled descriptor similarity")
    parser.add_argument("--fused_e2e", action="store_true",
                        help="end-to-end fused training: device DoG "
                             "detection + dense_gray descriptor CNN learn "
                             "jointly with the matcher through the exact "
                             "fused inference program")
    parser.add_argument("--cache_features", action="store_true",
                        help="compute each batch's host features once and "
                             "reuse across epochs (single-core hosts: ~6x "
                             "more steps/hour; freezes augmentation)")
    parser.add_argument("--photo_dir", type=str, default=None,
                        help="mix ImageFolderPairDataset scenes from this "
                             "folder into the synthetic train set")
    args = parser.parse_args(argv)

    cfg = load_config(args.config_path if os.path.exists(args.config_path)
                      else None)
    import dataclasses

    if args.descriptor_source != "carhynet":
        cfg = dataclasses.replace(
            cfg, frontend=dataclasses.replace(
                cfg.frontend, descriptor_source=args.descriptor_source
            ),
        )
    if args.neg_cells:
        cfg = dataclasses.replace(
            cfg, matcher=dataclasses.replace(
                cfg.matcher, neg_cells=args.neg_cells
            ),
        )
    if args.init_scheme:
        cfg = dataclasses.replace(
            cfg, matcher=dataclasses.replace(
                cfg.matcher, init_scheme=args.init_scheme
            ),
        )
    save_dir = resolve_save_dir(
        Path(cfg.train.output_dir) / args.name, args.restore_path
    )
    from gims_tpu.train.loop import train

    train_dataset = None
    if args.photo_dir:
        from gims_tpu.train import data as data_mod

        n = args.limit if args.limit > 0 else 1000
        train_dataset = data_mod.MixedPairDataset([
            data_mod.SyntheticPairDataset(cfg.dataset, length=n // 2, seed=0),
            data_mod.ImageFolderPairDataset(
                cfg.dataset, args.photo_dir, length=n - n // 2, seed=1
            ),
        ])

    multihost = args.coordinator is not None
    if multihost:
        from gims_tpu.train import multihost as mh_mod

        mh_mod.initialize(args.coordinator, args.num_processes,
                          args.process_id)

    train(cfg, train_dataset=train_dataset, save_dir=save_dir,
          limit=args.limit,
          n_devices=args.devices, carhynet_weights=args.carhynet_weights,
          max_steps=args.max_steps, fast_frontend=args.fast,
          restore_path=args.restore_path,
          cache_features=args.cache_features,
          init_weights=args.init_weights,
          fused_e2e=args.fused_e2e, multihost=multihost)


if __name__ == "__main__":
    main()
