"""Banded-matmul Gaussian blur vs cv2 oracle (frontend/blurmat.py).

The detection pyramid's MXU blur path must match cv2.GaussianBlur with
BORDER_REFLECT_101 — this is what makes device DoG detection agree with
OpenCV SIFT (reference: utils/library.py:252-266)."""

import numpy as np
import cv2
import jax.numpy as jnp
import pytest

from gims_tpu.frontend.blurmat import band_matrix, sep_blur_matmul
from gims_tpu.frontend.pyramid import gaussian_kernel_1d


@pytest.mark.parametrize("h,w,sigma", [
    (64, 80, 1.2262735),      # pyramid's first incremental sigma
    (37, 51, 2.0),
    (128, 96, 3.2),
    (9, 11, 1.6),             # tiny tail octave: multifold host path
    (5, 7, 2.0),
])
def test_band_blur_matches_cv2(h, w, sigma):
    kern = gaussian_kernel_1d(sigma)
    rng = np.random.RandomState(0)
    x = rng.rand(h, w).astype(np.float32) * 255

    bh = band_matrix(h, kern)
    bw = band_matrix(w, kern)
    y = np.asarray(sep_blur_matmul(jnp.asarray(x), bh, bw))

    k = kern.shape[0]
    ref = cv2.GaussianBlur(x, (k, k), sigmaX=sigma, sigmaY=sigma,
                           borderType=cv2.BORDER_REFLECT_101)
    assert np.abs(y - ref).max() < 2e-3


def test_band_matrix_columns_sum_to_one():
    kern = gaussian_kernel_1d(1.6)
    for n in (5, 9, 33, 200):
        m = np.asarray(band_matrix(n, kern))
        np.testing.assert_allclose(m.sum(axis=0), 1.0, atol=1e-5)


def test_gray_pyramid_blur_path_consistent():
    """Matmul-blur pyramid ~= conv-blur pyramid (same math, the conv path
    carries XLA's reduced conv precision — tolerance covers it)."""
    from gims_tpu.frontend.detect_device import build_gray_blur, gray_pyramid

    rng = np.random.RandomState(1)
    img = rng.randint(0, 255, (48, 64, 3)).astype(np.uint8)
    a = gray_pyramid(jnp.asarray(img), 48, 64)
    b = gray_pyramid(jnp.asarray(img), 48, 64, build_gray_blur(48, 64))
    assert len(a) == len(b)
    for oa, ob in zip(a, b):
        assert oa.shape == ob.shape
        assert float(jnp.max(jnp.abs(oa - ob))) < 1.5
