"""On-device SIFT detection vs the OpenCV host detector.

The device detector is a speed path, not a bit-parity path (see
frontend/detect_device.py docstring): assertions are recall/localization
style, not exact-set equality.
"""

import numpy as np
import cv2
import pytest

from gims_tpu.config import FrontendConfig
from gims_tpu.frontend.detect_device import detect_device
from gims_tpu.frontend.sift import detect


def _textured(h, w, seed=7):
    rng = np.random.RandomState(seed)
    img = rng.randint(0, 255, (h // 4, w // 4, 3)).astype(np.uint8)
    img = cv2.resize(img, (w, h), interpolation=cv2.INTER_CUBIC)
    return cv2.GaussianBlur(img, (0, 0), 1.2)


def test_device_detect_matches_cv2_locations():
    img = _textured(120, 160)
    cfg = FrontendConfig()
    kp_cv = detect(img, cfg, max_keypoints=512)
    kp_dev, padded = detect_device(img, max_keypoints=512)

    assert len(kp_dev) > 0.5 * len(kp_cv), (len(kp_dev), len(kp_cv))

    # recall: fraction of cv2 keypoints with a device keypoint within 1.5px
    d = np.linalg.norm(
        kp_cv.pt[:, None, :] - kp_dev.pt[None, :, :], axis=-1
    )
    nearest = d.min(axis=1)
    recall = float((nearest < 1.5).mean())
    assert recall > 0.6, recall

    # matched pairs should agree on scale (size) within 2x
    j = d.argmin(axis=1)
    close = nearest < 1.5
    ratio = kp_dev.size[j[close]] / np.maximum(kp_cv.size[close], 1e-6)
    assert float(np.median(np.abs(np.log2(ratio)))) < 1.0

    # padded dict invariants
    v = np.asarray(padded["valid"])
    assert v.shape == (512,)
    assert np.all(np.asarray(padded["response"])[~v] == 0)


def _angle_shift_under_rot90(detect_fn):
    """Median (angle_rot - angle_orig) mod 360 over co-located keypoints."""
    img = _textured(128, 128, seed=3)
    rot = cv2.rotate(img, cv2.ROTATE_90_CLOCKWISE)
    kp0, kp1 = detect_fn(img), detect_fn(rot)
    assert len(kp0) > 20 and len(kp1) > 20
    h = img.shape[0]
    mapped = np.stack([h - 1.0 - kp0.pt[:, 1], kp0.pt[:, 0]], axis=-1)
    d = np.linalg.norm(mapped[:, None, :] - kp1.pt[None, :, :], axis=-1)
    nearest = d.min(axis=1)
    j = d.argmin(axis=1)
    close = nearest < 1.0
    assert close.sum() > 10
    da = (kp1.angle[j[close]] - kp0.angle[close]) % 360.0
    # circular median via the angle of the mean unit vector
    rad = np.deg2rad(da)
    return float(np.degrees(np.arctan2(
        np.sin(rad).mean(), np.cos(rad).mean()
    ))) % 360.0


def test_device_detect_angle_covariance_matches_cv2():
    """The device angle must transform under image rotation the same way
    cv2's keypoint angles do — that is what the patch-warp geometry
    (frontend/patches.py inverse_affines) assumes."""
    cfg = FrontendConfig()
    shift_cv = _angle_shift_under_rot90(
        lambda im: detect(im, cfg, max_keypoints=256)
    )
    shift_dev = _angle_shift_under_rot90(
        lambda im: detect_device(im, max_keypoints=256)[0]
    )
    diff = abs(shift_cv - shift_dev) % 360.0
    diff = min(diff, 360.0 - diff)
    assert diff < 15.0, (shift_cv, shift_dev)


def test_device_detect_flat_image_empty():
    img = np.full((96, 96, 3), 128, np.uint8)
    kp, padded = detect_device(img, max_keypoints=128)
    assert len(kp) == 0
    assert not np.asarray(padded["valid"]).any()
