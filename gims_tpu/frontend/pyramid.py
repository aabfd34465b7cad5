"""Gaussian pyramid — OpenCV-SIFT-compatible, built on device.

The reference rebuilds OpenCV SIFT's internal pyramid on the host with
cv2 (reference: utils/library.py:234-293): base image 2x-upsampled
(firstOctave = -1), nOctaveLayers+3 = 6 layers per octave, sigma 1.6,
incremental blurs sig_i = sqrt((1.6 k^i)^2 - (1.6 k^{i-1})^2), k = 2^(1/3),
next octave seeded by 2x-nearest downsample of layer `nOctaveLayers`.

Building it on the TPU instead (separable depthwise convolutions) avoids
shipping ~180 MB of pyramid levels over PCIe per image — only the base
uint8 frame crosses the host boundary. The blurs run in f32 (the reference
blurs uint8 with per-level rounding; descriptor outputs agree to ~1e-3,
verified in tests/test_frontend.py).
"""

from __future__ import annotations

import functools
import math
from typing import List, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

N_OCTAVE_LAYERS = 3
SIGMA = 1.6
FIRST_OCTAVE = -1


def blur_sigmas() -> List[float]:
    """Incremental blur sigmas for layers 1..5 (index 0 unused)."""
    k = 2.0 ** (1.0 / N_OCTAVE_LAYERS)
    sig = [SIGMA]
    for i in range(1, N_OCTAVE_LAYERS + 3):
        sig_prev = (k ** (i - 1)) * SIGMA
        sig_total = sig_prev * k
        sig.append(math.sqrt(sig_total**2 - sig_prev**2))
    return sig


def num_octaves(height: int, width: int) -> int:
    """Octave count for a 2x-upsampled base (reference: library.py:248-250)."""
    n = round(math.log(min(width, height)) / math.log(2.0) - 2.0)
    return int(n) - FIRST_OCTAVE


def gaussian_kernel_1d(sigma: float) -> np.ndarray:
    """cv2.getGaussianKernel for float images: ksize = round(sigma*8+1)|1."""
    ksize = int(round(sigma * 8 + 1)) | 1
    half = ksize // 2
    x = np.arange(-half, half + 1, dtype=np.float64)
    w = np.exp(-(x**2) / (2.0 * sigma * sigma))
    return (w / w.sum()).astype(np.float32)


def _sep_blur(img: jnp.ndarray, kern: jnp.ndarray) -> jnp.ndarray:
    """Separable depthwise Gaussian blur, BORDER_REFLECT_101.

    img: (H, W, C) f32."""
    k = kern.shape[0]
    half = k // 2
    c = img.shape[-1]
    x = jnp.pad(img, ((half, half), (half, half), (0, 0)), mode="reflect")
    x = x[None]  # NHWC
    kv = jnp.broadcast_to(kern[:, None, None, None], (k, 1, 1, c))
    kh = jnp.broadcast_to(kern[None, :, None, None], (1, k, 1, c))
    dn = jax.lax.conv_dimension_numbers(x.shape, kv.shape, ("NHWC", "HWIO", "NHWC"))
    x = jax.lax.conv_general_dilated(
        x, kv, (1, 1), "VALID", dimension_numbers=dn, feature_group_count=c
    )
    dn = jax.lax.conv_dimension_numbers(x.shape, kh.shape, ("NHWC", "HWIO", "NHWC"))
    x = jax.lax.conv_general_dilated(
        x, kh, (1, 1), "VALID", dimension_numbers=dn, feature_group_count=c
    )
    return x[0]


def build_pyramid_device(base: jnp.ndarray, n_oct: int,
                         n_layers: int = N_OCTAVE_LAYERS + 3):
    """base: (H, W, C) f32 — the ALREADY 2x-upsampled image.

    Returns a list of n_oct arrays, octave o shaped (n_layers, H>>o, W>>o, C).
    Trace-once per base shape (wrap in jit at the call site).
    n_layers may be trimmed to N_OCTAVE_LAYERS + 1 = 4 when only the
    keypoint-bearing layers 1..3 are consumed (dense descriptor path) —
    layer 3 still seeds the next octave, so the chain is unchanged.
    """
    if n_layers < N_OCTAVE_LAYERS + 1:
        raise ValueError("need layers through N_OCTAVE_LAYERS to seed octaves")
    sigs = blur_sigmas()
    kerns = [jnp.asarray(gaussian_kernel_1d(s)) for s in sigs]
    octaves = []
    img = base
    for o in range(n_oct):
        layers = [img]
        for i in range(1, n_layers):
            layers.append(_sep_blur(layers[-1], kerns[i]))
        octaves.append(jnp.stack(layers))
        # nearest 2x downsample of layer N_OCTAVE_LAYERS (reference:268)
        img = layers[N_OCTAVE_LAYERS][::2, ::2]
    return octaves


def upsample2x(image: jnp.ndarray) -> jnp.ndarray:
    """2x bilinear upsample, half-pixel centers (cv2 INTER_LINEAR_EXACT)."""
    h, w = image.shape[:2]
    return jax.image.resize(
        image, (h * 2, w * 2) + image.shape[2:], method="linear"
    )


@functools.partial(jax.jit, static_argnums=(1, 2))
def pyramid_from_uint8(image_u8: jnp.ndarray, h: int, w: int):
    """Full device pipeline: uint8 (H, W, C) -> upsampled base -> pyramid."""
    base = upsample2x(image_u8.astype(jnp.float32))
    return tuple(build_pyramid_device(base, num_octaves(2 * h, 2 * w)))


def build_pyramid_host(image_bgr: np.ndarray, graydesc: bool = False):
    """cv2 reference implementation (float32), for parity tests only."""
    import cv2

    base = image_bgr
    if graydesc and base.ndim != 2:
        base = cv2.cvtColor(base, cv2.COLOR_BGR2GRAY)
    base = cv2.resize(
        base.astype(np.float32), (0, 0), fx=2, fy=2,
        interpolation=cv2.INTER_LINEAR,
    )
    rows, cols = base.shape[:2]
    n_oct = num_octaves(rows, cols)
    sigs = blur_sigmas()
    pyr = []
    for o in range(n_oct):
        for i in range(N_OCTAVE_LAYERS + 3):
            if o == 0 and i == 0:
                img = base
            elif i == 0:
                src = pyr[(o - 1) * (N_OCTAVE_LAYERS + 3) + N_OCTAVE_LAYERS]
                img = cv2.resize(src, (0, 0), fx=0.5, fy=0.5,
                                 interpolation=cv2.INTER_NEAREST)
            else:
                src = pyr[o * (N_OCTAVE_LAYERS + 3) + i - 1]
                img = cv2.GaussianBlur(src, (0, 0), sigmaX=sigs[i],
                                       sigmaY=sigs[i])
            pyr.append(img)
    return pyr
