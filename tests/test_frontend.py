"""Frontend tests: octave unpacking, device pyramid vs cv2, patch warp vs
cv2.warpAffine, and the full extractor on a synthetic textured image."""

import cv2
import numpy as np
import pytest
import jax.numpy as jnp

from gims_tpu.config import FrontendConfig
from gims_tpu.frontend import sift as fsift
from gims_tpu.frontend.pyramid import (
    build_pyramid_host, pyramid_from_uint8, num_octaves, blur_sigmas,
)
from gims_tpu.frontend.patches import (
    inverse_affines, warp_patches_level, extract_patches, WARP_SIZE,
)
from gims_tpu.frontend.sift import KeypointArrays
from gims_tpu.frontend.feature import FeatureFrontend


def synthetic_image(h=120, w=160, seed=0):
    """Textured image with plenty of SIFT keypoints."""
    rng = np.random.RandomState(seed)
    img = rng.randint(0, 255, (h // 4, w // 4, 3), np.uint8)
    img = cv2.resize(img, (w, h), interpolation=cv2.INTER_CUBIC)
    img = cv2.GaussianBlur(img, (0, 0), 1.0)
    return img


def pack_octave(octave, layer, xi=0.0):
    po = octave & 0xFF
    pl = (layer & 0xFF) << 8
    pxi = (round((xi + 0.5) * 255) & 0xFF) << 16
    return po + pl + pxi


def test_unpack_octaves():
    cases = [(-1, 0), (-1, 3), (0, 1), (2, 5), (5, 2)]
    packed = np.array([pack_octave(o, l) for o, l in cases], np.int64)
    octave, layer, scale = fsift.unpack_octaves(packed)
    for i, (o, l) in enumerate(cases):
        assert octave[i] == o
        assert layer[i] == l
        want_scale = float(2.0 ** (-o))
        assert scale[i] == pytest.approx(want_scale)


def test_pyramid_device_vs_host():
    img = synthetic_image(64, 80)
    pyr_host = build_pyramid_host(img)
    pyr_dev = pyramid_from_uint8(jnp.asarray(img), 64, 80)
    n_oct = num_octaves(128, 160)
    assert len(pyr_dev) == n_oct
    for o in range(n_oct):
        for i in range(6):
            host_lvl = pyr_host[o * 6 + i]
            dev_lvl = np.asarray(pyr_dev[o][i])
            assert dev_lvl.shape == host_lvl.shape
            # f32 blurs vs cv2 f32 blurs: near-exact; resize seams tiny
            diff = np.abs(dev_lvl - host_lvl)
            assert np.mean(diff) < 0.5, (o, i, np.mean(diff))
            assert np.percentile(diff, 99) < 2.5, (o, i)


def _manual_kp(pt, size, angle, octave, layer):
    scale = float(2.0 ** (-octave))
    return KeypointArrays(
        pt=np.array([pt], np.float32),
        size=np.array([size], np.float32),
        angle=np.array([angle], np.float32),
        response=np.array([1.0], np.float32),
        octave=np.array([octave], np.int32),
        layer=np.array([layer], np.int32),
        scale=np.array([scale], np.float32),
    )


def _cv2_patch(img_f32, kp: KeypointArrays, i=0):
    """Reference-path patch via cv2 (float image, forward affine)."""
    step = kp.size[i] * kp.scale[i] * 0.5
    ptf = kp.pt[i] * kp.scale[i]
    angle = 360.0 - kp.angle[i]
    if abs(angle - 360.0) < 1.19209e-07:
        angle = 0.0
    phi = np.deg2rad(angle)
    s, c = np.sin(phi), np.cos(phi)
    A = np.float32([[c, -s], [s, c]]) / step
    Rptf = A @ ptf
    r = (WARP_SIZE - 1) / 2.0
    A = np.hstack([A, [[r - Rptf[0]], [r - Rptf[1]]]])
    warp = cv2.warpAffine(
        img_f32, A, (WARP_SIZE, WARP_SIZE), flags=cv2.INTER_CUBIC,
        borderMode=cv2.BORDER_CONSTANT,
    )
    return cv2.resize(warp, (32, 32), interpolation=cv2.INTER_AREA) / 255.0


@pytest.mark.parametrize("angle,size", [(0.0, 6.0), (37.0, 9.0), (300.0, 20.0)])
def test_warp_matches_cv2(angle, size):
    img = synthetic_image(100, 130, seed=3).astype(np.float32)
    kp = _manual_kp((60.0, 50.0), size, angle, octave=0, layer=1)
    ainv = inverse_affines(kp)
    levels = np.zeros((2, 100, 130, 3), np.float32)
    levels[1] = img
    got = np.asarray(
        warp_patches_level(
            jnp.asarray(levels), jnp.asarray([1], np.int32),
            jnp.asarray(ainv), "cubic",
        )
    )[0] / 255.0
    want = _cv2_patch(img, kp)
    # cv2 quantizes interpolation coefficients to 5 bits; allow small error
    assert np.abs(got - want).mean() < 0.004
    assert np.abs(got - want).max() < 0.06


def test_warp_edge_keypoint_border_zero():
    """Keypoints near the border must sample constant-zero outside."""
    img = np.full((60, 60, 3), 200.0, np.float32)
    kp = _manual_kp((1.0, 1.0), 40.0, 0.0, octave=0, layer=0)
    ainv = inverse_affines(kp)
    got = np.asarray(
        warp_patches_level(
            jnp.asarray(img[None]), jnp.asarray([0], np.int32),
            jnp.asarray(ainv), "cubic",
        )
    )[0]
    want = _cv2_patch(img, kp) * 255.0
    assert np.abs(got / 255.0 - want / 255.0).mean() < 0.01


def test_full_frontend_extract():
    img = synthetic_image(120, 160, seed=5)
    fe = FeatureFrontend(FrontendConfig())
    out = fe.extract(img)
    n = out["keypoints"].shape[0]
    assert n > 50, f"expected plenty of keypoints, got {n}"
    assert out["descriptors"].shape == (n, 256)
    # duplicated halves
    np.testing.assert_array_equal(
        out["descriptors"][:, :128], out["descriptors"][:, 128:]
    )
    # descriptors are L2-normalized per 128-half => full norm is sqrt(2)
    np.testing.assert_allclose(
        np.linalg.norm(out["descriptors"], axis=1),
        np.sqrt(2.0), rtol=1e-4,
    )
    assert out["scores"].shape == (n,)


def test_sift_descriptor_source():
    """descriptor_source='sift': host OpenCV descriptors, L2-normalized and
    duplicated to 256-d; device (padded) path agrees with the host path."""
    img = synthetic_image(120, 160, seed=5)
    cfg = FrontendConfig(descriptor_source="sift")
    fe = FeatureFrontend(cfg)
    out = fe.extract(img)
    n = out["keypoints"].shape[0]
    assert n > 50
    assert out["descriptors"].shape == (n, 256)
    np.testing.assert_array_equal(
        out["descriptors"][:, :128], out["descriptors"][:, 128:]
    )
    np.testing.assert_allclose(
        np.linalg.norm(out["descriptors"], axis=1), np.sqrt(2.0), rtol=1e-4
    )
    # oracle: cv2's own detect+compute at the same keypoints
    sift = fsift.make_sift(cfg)
    kps = sift.detect(img, None)
    kps, desc = sift.compute(img, kps)
    want = desc / np.maximum(
        np.linalg.norm(desc, axis=1, keepdims=True), 1e-12
    )
    np.testing.assert_allclose(out["descriptors"][:, :128], want, atol=1e-5)

    # padded/device path
    pout = fe.extract_padded(img)
    nb = pout["kpts"].shape[0]
    assert pout["desc"].shape == (nb, 256)
    np.testing.assert_allclose(
        np.asarray(pout["desc"][:n]), out["descriptors"], atol=2e-5
    )
    assert not np.asarray(pout["valid"][n:]).any()
    # padding rows are zero descriptors
    assert float(jnp.abs(pout["desc"][n:]).max()) == 0.0

    # train_topup keeps fixed counts in sift mode too
    kp2, d2 = fsift.detect_and_describe(
        img, cfg, max_keypoints=3000, train_topup=True,
        rng=np.random.RandomState(0),
    )
    assert len(kp2) == d2.shape[0]
    assert len(kp2) >= 2900  # cv2.compute may drop a few border points


def test_detect_train_topup():
    img = synthetic_image(100, 100, seed=2)
    cfg = FrontendConfig()
    kp = fsift.detect(img, cfg, max_keypoints=5000, train_topup=True,
                      rng=np.random.RandomState(0))
    assert len(kp) == 5000


def test_fast_mode_quality():
    """Fast mode (linear, direct 32) must stay close to parity patches."""
    from gims_tpu.frontend.patches import extract_patches_device
    from gims_tpu.frontend.pyramid import pyramid_from_uint8
    from gims_tpu.frontend import sift as fs
    from gims_tpu.config import FrontendConfig
    import jax.numpy as jnp

    img = synthetic_image(120, 160, seed=9)
    kp = fs.detect(img, FrontendConfig())
    pyr = pyramid_from_uint8(jnp.asarray(img), 120, 160)
    nb = 256
    par = np.asarray(extract_patches_device(pyr, kp, nb, "cubic", 64))
    fast = np.asarray(extract_patches_device(pyr, kp, nb, "linear", 32))
    n = min(len(kp), nb)
    a = par[:n].reshape(n, -1)
    b = fast[:n].reshape(n, -1)
    # high per-patch correlation between the two modes
    a_c = a - a.mean(1, keepdims=True)
    b_c = b - b.mean(1, keepdims=True)
    denom = np.linalg.norm(a_c, axis=1) * np.linalg.norm(b_c, axis=1) + 1e-9
    corr = (a_c * b_c).sum(1) / denom
    assert np.median(corr) > 0.9, float(np.median(corr))


def test_block_path_matches_quad_path():
    """The block-gather fast path must equal the quad-row path exactly
    (same math, different fetch), including border keypoints."""
    from gims_tpu.frontend import patches as P

    rng = np.random.RandomState(11)
    L, h, w, c = 3, 90, 110, 3
    levels = jnp.asarray(rng.rand(L, h, w, c).astype(np.float32) * 255)
    k = 256
    li = jnp.asarray(rng.randint(0, L, k).astype(np.int32))
    ainv = np.zeros((k, 2, 3), np.float32)
    ang = rng.uniform(0, 2 * np.pi, k)
    sc = rng.uniform(0.3, 3.5, k)  # SIFT step range
    ainv[:, 0, 0] = np.cos(ang) * sc
    ainv[:, 0, 1] = np.sin(ang) * sc
    ainv[:, 1, 0] = -np.sin(ang) * sc
    ainv[:, 1, 1] = np.cos(ang) * sc
    ainv[:, 0, 2] = rng.uniform(-20, w + 20, k)
    ainv[:, 1, 2] = rng.uniform(-20, h + 20, k)
    spans = P.block_spans(ainv)
    ok = (spans <= P.BLOCK_SPAN_LIMIT).all(axis=1)
    assert ok.sum() > 100  # most are block-eligible

    quads = P.quad_rows_from_levels(levels)
    want = np.asarray(P._warp_chunk(
        quads, h, w, c, li, jnp.asarray(ainv), "linear", 32))
    brows = P.block_rows_from_levels(levels)
    nby, nbx = P.block_grid(h, w)
    got = np.asarray(P._warp_chunk_block(
        brows, nby, nbx, h, w, c, li, jnp.asarray(ainv), 32))
    diff = np.abs(got[ok] - want[ok])
    assert diff.max() < 1e-3, float(diff.max())


def test_extract_device_block_split():
    """extract_patches_device must route block-ineligible keypoints (huge
    step) through the quad path and still match the pure-quad result."""
    from gims_tpu.frontend import patches as P

    img = synthetic_image(120, 160, seed=13)
    kp = fsift.detect(img, FrontendConfig())
    # inflate some sizes so their span exceeds the block limit
    kp.size[::7] *= 4.0
    pyr = pyramid_from_uint8(jnp.asarray(img), 120, 160)
    nb = 256
    import unittest.mock as mock
    with mock.patch.object(P, "BLOCK_PATH_ENABLED", True):
        fast = np.asarray(
            P.extract_patches_device(pyr, kp, nb, "linear", 32))
    spans = P.block_spans(P.inverse_affines(kp))
    assert (spans > P.BLOCK_SPAN_LIMIT).any(axis=1).sum() > 0
    quad_only = np.asarray(
        P.extract_patches_device(pyr, kp, nb, "linear", 32))
    np.testing.assert_allclose(fast, quad_only, atol=1e-5)
