"""Device SIFT descriptor (frontend/sift_descriptor.py) vs the cv2 oracle.

cv2.SIFT.compute is the behavioral spec (the reference consumes SIFT
through cv2 — reference: utils/common.py:851-893). Exact bit parity is
impossible under static shapes (cv2 walks a data-dependent integer-pixel
radius; the device kernel samples a fixed rotated grid), so the oracle
asserts high cosine agreement per descriptor.
"""

import cv2
import numpy as np
import pytest

import jax.numpy as jnp

from gims_tpu.config import FrontendConfig
from gims_tpu.frontend import sift_descriptor as sd
from gims_tpu.frontend.detect_device import gray_pyramid
from gims_tpu.frontend.sift import (
    filter_top_responses,
    keypoints_to_arrays,
    make_sift,
)


def _synth_image(rng, h=180, w=240):
    img = np.zeros((h, w, 3), np.uint8)
    for _ in range(30):
        x, y = rng.randint(0, w), rng.randint(0, h)
        c = tuple(int(v) for v in rng.randint(0, 255, 3))
        cv2.circle(img, (x, y), rng.randint(3, 20), c, -1)
    return cv2.GaussianBlur(img, (0, 0), 1.0)


@pytest.fixture(scope="module")
def oracle():
    rng = np.random.RandomState(7)
    img = _synth_image(rng)
    cfg = FrontendConfig()
    sift = make_sift(cfg)
    kps = sift.detect(img, None)
    kps = filter_top_responses(kps, 300)
    kps_cv, desc_cv = sift.compute(img, kps)
    kp = keypoints_to_arrays(kps_cv)
    pyr = gray_pyramid(jnp.asarray(img), img.shape[0], img.shape[1],
                       None, True)
    return img, kp, desc_cv.astype(np.float64), pyr


def _cosines(a, b):
    na = np.linalg.norm(a, axis=1)
    nb = np.linalg.norm(b, axis=1)
    return (a * b).sum(1) / np.maximum(na * nb, 1e-9)


def test_describe_matches_cv2(oracle):
    _, kp, desc_cv, pyr = oracle
    desc_dev = sd.describe(pyr, kp, s=16).astype(np.float64)
    assert desc_dev.shape == desc_cv.shape
    cos = _cosines(desc_cv, desc_dev)
    assert cos.mean() >= 0.995
    assert np.percentile(cos, 5) >= 0.985
    assert cos.min() >= 0.96


def test_describe_s12_close(oracle):
    """S=12 (1.8x fewer gather rows) stays close to the oracle."""
    _, kp, desc_cv, pyr = oracle
    cos = _cosines(desc_cv, sd.describe(pyr, kp, s=12).astype(np.float64))
    assert cos.mean() >= 0.99


def test_describe_value_range(oracle):
    """cv2 finalization parity: integer values in [0, 255]."""
    _, kp, _, pyr = oracle
    desc = sd.describe(pyr, kp, s=16)
    assert desc.min() >= 0.0 and desc.max() <= 255.0
    assert np.allclose(desc, np.round(desc))


def test_describe_device_padding(oracle):
    _, kp, _, pyr = oracle
    n = len(kp)
    bucket = n + 37
    dev = np.asarray(sd.describe_device(pyr, kp, bucket, s=16))
    host = sd.describe(pyr, kp, s=16)
    np.testing.assert_allclose(dev[:n], host, atol=1e-3)
    assert (dev[n:] == 0).all()


def test_fused_devsift_contract():
    """FusedMatching(descriptor_source='devsift') runs end-to-end and
    emits the reference dict contract."""
    from gims_tpu.fused import FusedMatching

    rng = np.random.RandomState(3)
    img0 = _synth_image(rng, 120, 160)
    m = cv2.getRotationMatrix2D((80, 60), 5.0, 1.0)
    img1 = cv2.warpAffine(img0, m, (160, 120))
    fm = FusedMatching(
        {"descriptor_source": "devsift", "compact_transport": False},
        total_keypoints=512, seed=0,
    )
    pred = fm(img0, img1)
    n0 = pred["keypoints0"].shape[1]
    assert pred["matches0"].shape == (1, n0)
    ms = pred["matches0"][0]
    assert (ms >= -1).all() and (ms < pred["keypoints1"].shape[1]).all()


def test_staged_devsift_frontend():
    """FeatureFrontend with detector='device' + sift_descriptor='device'
    produces unit-norm duplicated 256-d descriptors on device."""
    from gims_tpu.config import FrontendConfig
    from gims_tpu.frontend.feature import FeatureFrontend

    rng = np.random.RandomState(5)
    img = _synth_image(rng, 120, 160)
    fe = FeatureFrontend(FrontendConfig(
        descriptor_source="sift", detector="device",
        sift_descriptor="device"))
    out = fe.extract_padded(img, max_keypoints=256, bucket=256)
    desc = np.asarray(out["desc"])
    n = out["n"]
    assert n > 0
    assert desc.shape == (256, 256)
    np.testing.assert_allclose(desc[:n, :128], desc[:n, 128:], atol=1e-6)
    norms = np.linalg.norm(desc[:n], axis=1)
    np.testing.assert_allclose(norms, np.sqrt(2.0), atol=1e-3)
