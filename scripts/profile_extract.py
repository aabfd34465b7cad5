#!/usr/bin/env python
"""Stage-by-stage device profile of the fused extraction path.

Times each component of fused._extract_side at 800x600 / 12288 budget on
the real backend. Every probe is its own jitted program; sync is forced
with a scalar readout (block_until_ready is unreliable through the axon
tunnel — see README environment notes).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def sync_time(fn, *args, reps=3):
    import jax
    import jax.numpy as jnp

    out = fn(*args)  # compile
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(leaf.astype(jnp.float32) if leaf.dtype != jnp.bool_
                  else leaf.astype(jnp.int32)))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(jnp.sum(leaf.astype(jnp.float32) if leaf.dtype != jnp.bool_
                      else leaf.astype(jnp.int32)))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--total", type=int, default=12288)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    import jax.numpy as jnp
    import functools

    from gims_tpu import fused
    from gims_tpu.config import FrontendConfig
    from gims_tpu.frontend.detect_device import (
        _octave_candidates, _orientation_maps, gray_pyramid)
    from gims_tpu.frontend.pyramid import build_pyramid_device, upsample2x
    from gims_tpu.carhynet.model import CARHyNet
    from gims_tpu.carhynet.engine import DescriptorEngine

    h, w = 600, 800
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (h, w, 3)).astype(np.uint8)
    img_d = jax.device_put(jnp.asarray(img))

    # upload cost
    t0 = time.perf_counter()
    x = jax.device_put(img)
    float(jnp.sum(x.astype(jnp.float32)))
    up = time.perf_counter() - t0
    print(f"upload 1.44MB + sum: {up*1e3:.1f} ms")

    @functools.partial(jax.jit, static_argnums=(1, 2))
    def f_gray(im, h, w):
        return [o.sum() for o in gray_pyramid(im, h, w)]

    print(f"gray_pyramid: {sync_time(f_gray, img_d, h, w)*1e3:.1f} ms")

    from gims_tpu.frontend.detect_device import build_gray_blur

    blur = build_gray_blur(h, w)

    @functools.partial(jax.jit, static_argnums=(1, 2))
    def f_gray_mm(im, h, w, blur=None):
        return [o.sum() for o in gray_pyramid(im, h, w, blur)]

    print(f"gray_pyramid (banded matmul): "
          f"{sync_time(f_gray_mm, img_d, h, w, blur)*1e3:.1f} ms")

    @functools.partial(jax.jit, static_argnums=(1, 2))
    def f_ori(im, h, w):
        return [_orientation_maps(g).sum() for g in gray_pyramid(im, h, w)]

    print(f"gray_pyramid + orientation: {sync_time(f_ori, img_d, h, w)*1e3:.1f} ms")

    @functools.partial(jax.jit, static_argnums=(1, 2))
    def f_cand(im, h, w):
        outs = []
        for g in gray_pyramid(im, h, w):
            ori = _orientation_maps(g)
            c = _octave_candidates(g, 0.001, 80.0, ori)
            outs.append(c["score"].sum())
        return outs

    print(f"  + candidates: {sync_time(f_cand, img_d, h, w)*1e3:.1f} ms")

    @functools.partial(jax.jit, static_argnums=(1, 2))
    def f_color(im, h, w):
        base = upsample2x(im.astype(jnp.float32))
        octs = build_pyramid_device(base, len(gray_pyramid(im, h, w)))
        return [o.sum() for o in octs]

    print(f"color pyramid (6 layers): {sync_time(f_color, img_d, h, w)*1e3:.1f} ms")

    eng = DescriptorEngine(seed=0)
    dense_model = CARHyNet(dense=True)
    car_vars = jax.device_put(eng.variables)

    @functools.partial(jax.jit, static_argnums=(2, 3))
    def f_dense(im, cv, h, w):
        base = upsample2x(im.astype(jnp.float32))
        octs = build_pyramid_device(base, len(gray_pyramid(im, h, w)))
        outs = []
        for o in range(len(octs)):
            if min(int(octs[o].shape[1]), int(octs[o].shape[2])) < 16:
                break
            levels = octs[o][1:4].astype(jnp.float32) / 255.0
            maps3 = dense_model.apply(cv, levels, train=False)
            outs.append(maps3.sum())
        return outs

    print(f"color pyramid + dense CAR-HyNet: {sync_time(f_dense, img_d, car_vars, h, w)*1e3:.1f} ms")

    budgets = fused.octave_budgets(h, w, args.total)
    fe = FrontendConfig(interpolation="linear", warp_size=32,
                        descriptor_source="dense")
    car_model = CARHyNet()

    @functools.partial(jax.jit, static_argnums=(2, 3, 4, 5))
    def f_extract(im, cv, h, w, budgets, fe):
        kp, sc, va, de = fused._extract_side(
            im, h, w, budgets, fe, cv, car_model, dense_model)
        return de.sum()

    print(f"full _extract_side (dense): {sync_time(f_extract, img_d, car_vars, h, w, budgets, fe)*1e3:.1f} ms", flush=True)

    gray_model = CARHyNet(in_channels=1)
    gray_dense = CARHyNet(dense=True, in_channels=1)
    gray_vars = jax.device_put(gray_model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 1), jnp.float32)))
    fe_gray = FrontendConfig(interpolation="linear", warp_size=32,
                             descriptor_source="dense_gray")
    img_gray = jax.device_put(jnp.asarray(
        (0.114 * img[..., 0] + 0.587 * img[..., 1]
         + 0.299 * img[..., 2]).astype(np.uint8)))

    @functools.partial(jax.jit, static_argnums=(2, 3, 4, 5))
    def f_extract_gray(im, cv, h, w, budgets, fe, blur=None):
        kp, sc, va, de = fused._extract_side(
            im, h, w, budgets, fe, cv, gray_model, gray_dense, blur)
        return de.sum()

    print(f"full _extract_side (dense_gray, gray input): {sync_time(f_extract_gray, img_gray, gray_vars, h, w, budgets, fe_gray)*1e3:.1f} ms", flush=True)
    print(f"full _extract_side (dense_gray + matmul blur): {sync_time(f_extract_gray, img_gray, gray_vars, h, w, budgets, fe_gray, blur)*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
