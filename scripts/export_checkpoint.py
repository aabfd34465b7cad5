#!/usr/bin/env python
"""Export an orbax training checkpoint to the flat-npz weights format that
Matching(weights_path=...) and bench.py load.

Usage: python scripts/export_checkpoint.py output/train/sift_synth/weights/minloss weights/gims_tpu_sift.npz [--raw]

Prefers the EMA weights when present (like the reference loader,
models/gmatcher.py:208-217); --raw forces the raw params.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt")
    ap.add_argument("out")
    ap.add_argument("--raw", action="store_true")
    ap.add_argument("--e2e", action="store_true",
                    help="joint fused-e2e checkpoint: restore the joint "
                         "tree and write <out>.npz + <out>_car.npz")
    ap.add_argument("--config", default=None,
                    help="the YAML the run was trained with (the restore "
                         "template must match: use_ema, optimizer groups)")
    args = ap.parse_args()

    # Checkpoint conversion is pure host work; never touch the remote
    # backend (the environment's sitecustomize pins JAX_PLATFORMS=axon
    # before this script runs, so the env var alone is not enough — and a
    # dead tunnel would hang the orbax restore forever).
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")

    from gims_tpu.config import load_config
    from gims_tpu.api import init_gmatcher_variables
    from gims_tpu.core import checkpoint as ckpt_io
    from gims_tpu.train import step as step_mod

    cfg = load_config(args.config)
    variables = init_gmatcher_variables(cfg.matcher)
    if args.e2e:
        import jax
        import jax.numpy as jnp

        from gims_tpu.carhynet.model import CARHyNet
        from gims_tpu.train import fused_step as fstep_mod

        car = CARHyNet(in_channels=1)
        car_vars = car.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 32, 32, 1), jnp.float32))
        variables = fstep_mod.joint_variables(cfg, variables, car_vars)
    state, _ = step_mod.create_train_state(cfg, variables, 100)
    from gims_tpu.train.loop import _ckpt_payload

    like = _ckpt_payload(state, 0, 0)
    loaded = ckpt_io.load_orbax(args.ckpt, like)
    ema = loaded.get("ema")
    use_ema = (not args.raw) and isinstance(ema, dict) and ema
    params = ema if use_ema else loaded["params"]
    bs = loaded["batch_stats"]
    if isinstance(params, dict) and "gmatcher" in params:
        # joint fused-e2e checkpoint -> matcher npz + sibling CNN npz
        ckpt_io.save_npz(args.out, {
            "params": params["gmatcher"],
            "batch_stats": bs.get("gmatcher", {}),
        })
        car_out = args.out[:-4] if args.out.endswith(".npz") else args.out
        car_out += "_car.npz"
        ckpt_io.save_npz(car_out, {
            "params": params["carhynet"],
            "batch_stats": bs.get("carhynet", {}),
        })
        print(f"saved {args.out} + {car_out}")
    else:
        ckpt_io.save_npz(args.out, {"params": params, "batch_stats": bs})
    print(f"epoch {int(loaded['epoch'])}, iter {int(loaded['iter'])}, "
          f"ema={bool(use_ema)}")


if __name__ == "__main__":
    main()
