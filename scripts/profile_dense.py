#!/usr/bin/env python
"""Per-stage device profile of the dense CAR-HyNet pass at octave-0 size."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools
import numpy as np


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    import jax.numpy as jnp
    from flax import linen as nn

    from gims_tpu.carhynet.engine import DescriptorEngine
    from gims_tpu.carhynet.model import CARHyNet

    eng = DescriptorEngine(seed=0)
    model = CARHyNet(dense=True)
    rng = np.random.RandomState(0)
    x_np = rng.rand(3, 1202, 1602, 3).astype(np.float32)

    def timed(fn, *args, reps=3):
        out = fn(*args)
        float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn(*args)
            float(jnp.sum(
                jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    for dt in (jnp.float32, jnp.bfloat16):
        x = jax.device_put(jnp.asarray(x_np, dt))
        variables = jax.tree_util.tree_map(
            lambda p: p.astype(dt)
            if jnp.issubdtype(p.dtype, jnp.floating) else p,
            eng.variables,
        )
        variables = jax.device_put(variables)

        full = timed(jax.jit(
            lambda v, a: model.apply(v, a, train=False)), variables, x)
        print(f"[{dt.__name__}] full dense apply: {full*1e3:.1f} ms", flush=True)

        # capture_intermediates lets us time prefixes by returning an
        # intermediate: cheaper to just re-run truncated stacks via
        # nn.apply of submodule chains — approximate with layer groups.
        probes = {
            "l1 only": lambda v, a: _prefix(v, a, model, 1),
            "l1-l2": lambda v, a: _prefix(v, a, model, 2),
            "l1-l4": lambda v, a: _prefix(v, a, model, 4),
            "l1-l6": lambda v, a: _prefix(v, a, model, 6),
        }
        for name, fn in probes.items():
            print(f"  {name}: {timed(jax.jit(fn), variables, x)*1e3:.1f} ms", flush=True)


def _prefix(variables, x, model, upto):
    """Re-run the model but stop after layer group `upto` by filtering
    intermediates."""
    import jax
    import jax.numpy as jnp

    filt = {
        1: "l1_tlu",
        2: "l2_sg",
        4: "l4_sg",
        6: "l6_tlu",
    }[upto]
    _, inter = model.apply(
        variables, x, train=False,
        capture_intermediates=lambda mdl, _: mdl.name == filt,
        mutable=["intermediates"],
    )
    leaves = jax.tree_util.tree_leaves(inter)
    return leaves[-1]


if __name__ == "__main__":
    main()
