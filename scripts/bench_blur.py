#!/usr/bin/env python
"""Microbenchmark: separable Gaussian blur formulations for the gray
detection pyramid.

Hypothesis: single-channel (H, W, 1) depthwise convs waste the TPU's
128-lane dimension; expressing the separable blur as two banded matmuls
(X @ Bw, Bh^T @ X) runs on the MXU instead. Verifies numerics vs the conv
path and times both at octave-0 size."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def blur_matrix(n: int, kern: np.ndarray) -> np.ndarray:
    """(n, n) matrix M with (x_padded conv kern)[j] = sum_i x[i] M[i, j],
    REFLECT_101 boundary (cv2 BORDER_REFLECT_101 = abba|abcd|dcba)."""
    k = kern.shape[0]
    half = k // 2
    m = np.zeros((n, n), np.float32)
    for t in range(k):
        for j in range(n):
            src = j + t - half
            # reflect_101 fold
            while src < 0 or src >= n:
                if src < 0:
                    src = -src
                if src >= n:
                    src = 2 * (n - 1) - src
            m[src, j] += kern[t]
    return m


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    import jax.numpy as jnp

    from gims_tpu.frontend.detect_device import _sep_blur_hw
    from gims_tpu.frontend.pyramid import gaussian_kernel_1d

    h, w = 1202, 1602
    sigma = 2.0
    kern = gaussian_kernel_1d(sigma)
    rng = np.random.RandomState(0)
    x = jax.device_put(jnp.asarray(rng.rand(h, w).astype(np.float32) * 255))
    kd = jnp.asarray(kern)
    bh = jax.device_put(jnp.asarray(blur_matrix(h, kern)))
    bw = jax.device_put(jnp.asarray(blur_matrix(w, kern)))

    @jax.jit
    def conv(img):
        return _sep_blur_hw(img, kd)

    @jax.jit
    def matmul(img):
        y = jnp.matmul(bh.T, img, precision=jax.lax.Precision.HIGH)
        return jnp.matmul(y, bw, precision=jax.lax.Precision.HIGH)

    @jax.jit
    def matmul_highest(img):
        y = jnp.matmul(bh.T, img, precision=jax.lax.Precision.HIGHEST)
        return jnp.matmul(y, bw, precision=jax.lax.Precision.HIGHEST)

    def timed(fn, reps=5):
        out = fn(x)
        float(jnp.sum(out))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn(x)
            float(jnp.sum(out))
            ts.append(time.perf_counter() - t0)
        return min(ts), out

    tc, yc = timed(conv)
    tm, ym = timed(matmul)
    th, yh = timed(matmul_highest)
    err = float(jnp.max(jnp.abs(yc - ym)))
    errh = float(jnp.max(jnp.abs(yc - yh)))
    print(f"conv (depthwise 1ch): {tc*1e3:.2f} ms", flush=True)
    print(f"banded matmul HIGH:   {tm*1e3:.2f} ms  max|diff|={err:.4g}",
          flush=True)
    print(f"banded matmul HIGHEST:{th*1e3:.2f} ms  max|diff|={errh:.4g}",
          flush=True)


if __name__ == "__main__":
    main()
