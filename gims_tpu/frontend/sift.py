"""Host-side SIFT keypoint detection.

Keypoint *detection* stays on the host CPU with OpenCV — exactly like the
reference (reference: utils/common.py:851-862; its GPU does not detect
either). Everything downstream (pyramid, patch warp, descriptors) runs on
the TPU.

Detection parameters are the reference's: contrastThreshold=0.001,
edgeThreshold=80, sigma=1.6 (reference: utils/common.py:838-848).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import cv2
import numpy as np

from gims_tpu.config import FrontendConfig


@dataclass
class KeypointArrays:
    """Struct-of-arrays view of cv2 keypoints (device-friendly)."""

    pt: np.ndarray        # (N, 2) f32 xy in input-image coordinates
    size: np.ndarray      # (N,) f32
    angle: np.ndarray     # (N,) f32 degrees
    response: np.ndarray  # (N,) f32
    octave: np.ndarray    # (N,) i32 unpacked octave (>= -1)
    layer: np.ndarray     # (N,) i32 layer within octave
    scale: np.ndarray     # (N,) f32 1/2^octave

    def __len__(self):
        return self.pt.shape[0]


def unpack_octaves(packed: np.ndarray):
    """Vectorized unpack of OpenCV's kp.octave field
    (reference: utils/library.py:16-35)."""
    packed = packed.astype(np.int64)
    octave = packed & 0xFF
    layer = (packed >> 8) & 0xFF
    octave = np.where(octave >= 128, octave | ~0xFF, octave)
    scale = np.where(
        octave >= 0, 1.0 / (1 << np.maximum(octave, 0)),
        (1 << np.maximum(-octave, 0)).astype(np.float64),
    ).astype(np.float32)
    return octave.astype(np.int32), layer.astype(np.int32), scale


def make_sift(cfg: FrontendConfig):
    return cv2.SIFT_create(
        nOctaveLayers=cfg.n_octave_layers,
        contrastThreshold=cfg.contrast_threshold,
        edgeThreshold=cfg.edge_threshold,
        sigma=cfg.sigma,
    )


def keypoints_to_arrays(kps) -> KeypointArrays:
    n = len(kps)
    pt = np.array([k.pt for k in kps], np.float32).reshape(n, 2)
    size = np.array([k.size for k in kps], np.float32)
    angle = np.array([k.angle for k in kps], np.float32)
    response = np.array([k.response for k in kps], np.float32)
    packed = np.array([k.octave for k in kps], np.int64)
    octave, layer, scale = unpack_octaves(packed)
    return KeypointArrays(pt, size, angle, response, octave, layer, scale)


def arrays_to_keypoints(kp: KeypointArrays):
    """Inverse of keypoints_to_arrays: rebuild cv2.KeyPoint objects with
    OpenCV's packed-octave convention so cv2.SIFT.compute can describe
    keypoints found by the DEVICE detector (frontend/detect_device.py).
    The sub-scale byte (xi) is left 0 — cv2's descriptor path never reads
    it (only octave/layer/size/angle matter)."""
    out = []
    for i in range(len(kp)):
        packed = (int(kp.octave[i]) & 0xFF) | ((int(kp.layer[i]) & 0xFF) << 8)
        out.append(cv2.KeyPoint(
            float(kp.pt[i, 0]), float(kp.pt[i, 1]), float(kp.size[i]),
            float(kp.angle[i]), float(kp.response[i]), packed,
        ))
    return out


def filter_top_responses(kps, max_num: int):
    """Keep the strongest max_num keypoints by response.

    Order parity with reference filterMaxNumDesc (utils/common.py:710-718):
    argsort ascending then reversed, so ties come out in descending original
    index order.
    """
    if not (0 < max_num < len(kps)):
        return list(kps)
    responses = np.array([k.response for k in kps])
    idxs = np.argsort(responses)[::-1]
    return [kps[i] for i in idxs[:max_num]]


def detect(
    image_bgr: np.ndarray,
    cfg: FrontendConfig,
    max_keypoints: Optional[int] = None,
    train_topup: bool = False,
    rng: Optional[np.random.RandomState] = None,
):
    """Detect SIFT keypoints; optionally top up to exactly max_keypoints by
    computing SIFT at random coordinates (train path parity, reference:
    utils/common.py:866-879 — keeps train shapes fixed at 2048)."""
    sift = make_sift(cfg)
    max_kp = cfg.max_keypoints if max_keypoints is None else max_keypoints
    kps = sift.detect(image_bgr, None)
    kps = filter_top_responses(kps, max_kp)
    if train_topup and 0 < max_kp and len(kps) < max_kp:
        rng = rng or np.random
        need = max_kp - len(kps)
        coords = np.empty((need, 2), np.float64)
        coords[:, 0] = rng.random_sample(need) * image_bgr.shape[1]
        coords[:, 1] = rng.random_sample(need) * image_bgr.shape[0]
        extra = [cv2.KeyPoint(float(x), float(y), 1) for x, y in coords]
        extra, _ = sift.compute(image_bgr, extra)
        kps = list(kps) + list(extra)
    return keypoints_to_arrays(kps)


def detect_and_describe(
    image_bgr: np.ndarray,
    cfg: FrontendConfig,
    max_keypoints: Optional[int] = None,
    train_topup: bool = False,
    rng: Optional[np.random.RandomState] = None,
):
    """Detect + host OpenCV SIFT descriptors in one pass.

    This is the `descriptor_source="sift"` frontend: the reference
    describes keypoints with a pretrained CAR-HyNet (weights/car_hynet.pth,
    reference: carhynet/models.py:644-653) whose weights are not available
    in this environment — raw SIFT descriptors are the standard substitute
    descriptor engine (and skip the patch-warp + CNN device work entirely).
    Returns (KeypointArrays, (N, 128) uint8 raw descriptors); normalize
    to unit L2 before use to match CAR-HyNet's unit-norm output
    (reference: carhynet/models.py:9-21 desc_l2norm).
    """
    sift = make_sift(cfg)
    max_kp = cfg.max_keypoints if max_keypoints is None else max_keypoints
    kps = sift.detect(image_bgr, None)
    kps = filter_top_responses(kps, max_kp)
    if train_topup and 0 < max_kp and len(kps) < max_kp:
        rng = rng or np.random
        need = max_kp - len(kps)
        coords = np.empty((need, 2), np.float64)
        coords[:, 0] = rng.random_sample(need) * image_bgr.shape[1]
        coords[:, 1] = rng.random_sample(need) * image_bgr.shape[0]
        kps = list(kps) + [
            cv2.KeyPoint(float(x), float(y), 1) for x, y in coords
        ]
    kps, desc = sift.compute(image_bgr, kps)
    if desc is None:
        desc = np.zeros((0, 128), np.float32)
    # OpenCV SIFT descriptor entries are integers in [0, 255] — returned
    # as uint8 so callers can ship 1/4 the bytes to the device (the
    # host->device tunnel runs at ~6 MB/s) and L2-normalize there.
    return keypoints_to_arrays(kps), desc.astype(np.uint8)
