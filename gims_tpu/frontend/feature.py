"""Full feature frontend: image -> keypoints + 256-d descriptors.

Equivalent of the reference's sift_forward (reference:
utils/common.py:837-893): host SIFT detect, device pyramid + patch warp,
CAR-HyNet descriptors, and the reference's 128->256 duplication
(reference: utils/common.py:891 torch.cat([d, d], dim=1)).
"""

from __future__ import annotations

import functools
import time
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from gims_tpu.config import FrontendConfig
from gims_tpu.carhynet.engine import DescriptorEngine
from gims_tpu.core.bucketing import DEFAULT_BUCKETS, bucket_size
from gims_tpu.frontend.sift import detect, detect_and_describe, KeypointArrays
from gims_tpu.frontend.pyramid import pyramid_from_uint8
from gims_tpu.frontend.patches import extract_patches, extract_patches_device


@jax.jit
def _normalize_duplicate(raw_u8):
    """(N, 128) uint8 -> (N, 256) f32 unit-norm duplicated descriptors
    (reference: utils/common.py:891 torch.cat([d, d], dim=1))."""
    d = raw_u8.astype(jnp.float32)
    norm = jnp.linalg.norm(d, axis=1, keepdims=True)
    d = d / jnp.maximum(norm, 1e-12)
    return jnp.concatenate([d, d], axis=1)


@functools.partial(jax.jit, static_argnums=(1, 2))
def _gray_pyr_jit(img_u8, h, w, blur):
    """Detection gray pyramid as one program (device SIFT descriptors)."""
    from gims_tpu.frontend.detect_device import gray_pyramid

    return gray_pyramid(img_u8, h, w, blur, True)


class FeatureFrontend:
    """Stateful wrapper holding the descriptor engine + compiled programs.

    descriptor_source="carhynet" (default) runs the reference frontend
    (device pyramid -> patch warp -> CAR-HyNet); "sift" uses host OpenCV
    SIFT descriptors — the in-env substitute when no pretrained
    car_hynet.pth exists, and a host-only fast path.
    """

    def __init__(self, cfg: Optional[FrontendConfig] = None,
                 engine: Optional[DescriptorEngine] = None,
                 weights_path: Optional[str] = None):
        self.cfg = cfg or FrontendConfig()
        self.engine = None
        self.dense = None
        self.dense_gray = None
        if self.cfg.descriptor_source != "sift":
            in_ch = 1 if self.cfg.descriptor_source == "dense_gray" else 3
            self.engine = engine or DescriptorEngine(
                weights_path=weights_path, in_channels=in_ch)
        if self.cfg.descriptor_source == "dense":
            from gims_tpu.frontend.dense import DenseDescriptorFrontend

            self.dense = DenseDescriptorFrontend(self.engine.variables)
        elif self.cfg.descriptor_source == "dense_gray":
            from gims_tpu.frontend.dense import DenseGrayDescriptorFrontend

            self.dense_gray = DenseGrayDescriptorFrontend(
                self.engine.variables, dtype=self.cfg.dense_dtype)
        self.timings = {}

    def extract(
        self,
        image_bgr: np.ndarray,
        max_keypoints: Optional[int] = None,
        train_topup: bool = False,
        rng: Optional[np.random.RandomState] = None,
    ):
        """image_bgr: (H, W, 3) uint8.

        Returns dict: keypoints (N,2) f32, scores (N,) f32,
        descriptors (N, 256) f32, kp (KeypointArrays).
        """
        t0 = time.perf_counter()
        if self.cfg.descriptor_source == "sift":
            kp, raw = detect_and_describe(
                image_bgr, self.cfg, max_keypoints, train_topup, rng
            )
            t1 = t2 = time.perf_counter()
            desc128 = raw.astype(np.float32)
            norms = np.linalg.norm(desc128, axis=1, keepdims=True)
            desc128 = desc128 / np.maximum(norms, 1e-12)
            desc256 = np.concatenate([desc128, desc128], axis=1)
            t3 = time.perf_counter()
        elif self.dense_gray is not None:
            kp = detect(image_bgr, self.cfg, max_keypoints, train_topup, rng)
            t1 = t2 = time.perf_counter()
            desc128 = np.asarray(
                self.dense_gray.compute(image_bgr, kp, len(kp)))
            desc256 = np.concatenate([desc128, desc128], axis=1)
            t3 = time.perf_counter()
        elif self.dense is not None:
            kp = detect(image_bgr, self.cfg, max_keypoints, train_topup, rng)
            t1 = time.perf_counter()
            h, w = image_bgr.shape[:2]
            pyramid = pyramid_from_uint8(jnp.asarray(image_bgr), h, w)
            t2 = time.perf_counter()
            desc128 = np.asarray(self.dense.compute(pyramid, kp, len(kp)))
            desc256 = np.concatenate([desc128, desc128], axis=1)
            t3 = time.perf_counter()
        else:
            kp = detect(image_bgr, self.cfg, max_keypoints, train_topup, rng)
            t1 = time.perf_counter()
            h, w = image_bgr.shape[:2]
            pyramid = pyramid_from_uint8(jnp.asarray(image_bgr), h, w)
            patches = extract_patches(pyramid, kp, self.cfg.interpolation)
            t2 = time.perf_counter()
            desc128 = self.engine.compute(patches)
            desc256 = np.concatenate([desc128, desc128], axis=1)
            t3 = time.perf_counter()
        self.timings = {
            "detect": t1 - t0, "patches": t2 - t1, "descriptors": t3 - t2,
        }
        return {
            "keypoints": kp.pt.copy(),
            "scores": kp.response.copy(),
            "descriptors": desc256,
            "kp": kp,
        }

    def extract_padded(
        self,
        image_bgr: np.ndarray,
        max_keypoints: Optional[int] = None,
        bucket: Optional[int] = None,
        train_topup: bool = False,
        rng: Optional[np.random.RandomState] = None,
    ):
        """Device-resident frontend: everything except SIFT detect stays on
        the TPU (the tunnel's host<->device bandwidth is the bottleneck —
        only the uint8 frame goes up and nothing comes back down here).

        Returns dict with DEVICE arrays padded to a bucket:
        kpts (Nb,2), desc (Nb,256), valid (Nb,), plus host scores/kp/n.
        """
        import jax.numpy as jnp

        t0 = time.perf_counter()
        host_desc = None
        dev_sift = False
        if self.cfg.descriptor_source == "sift":
            if self.cfg.detector == "device" and not train_topup:
                # middle ground (VERDICT r2 item 7): device DoG detection
                # (the host detect is the staged path's ~0.24 s/image
                # single-core ceiling) + SIFT descriptors at the detected
                # keypoints — stays compatible with the SIFT-descriptor-
                # trained weights. cfg.sift_descriptor picks the engine:
                # "host" = cv2.SIFT.compute (~0.8 s/image on one core),
                # "device" = frontend/sift_descriptor.py on the TPU.
                from gims_tpu.frontend.detect_device import detect_device
                from gims_tpu.frontend.sift import (
                    arrays_to_keypoints,
                    keypoints_to_arrays,
                    make_sift,
                )

                mk = max_keypoints if max_keypoints and max_keypoints > 0 \
                    else (bucket or 12288)
                kp_dev, _ = detect_device(
                    image_bgr, mk, self.cfg.contrast_threshold,
                    self.cfg.edge_threshold,
                )
                if self.cfg.sift_descriptor == "device":
                    kp = kp_dev
                    dev_sift = True
                else:
                    kps_cv, host_desc = make_sift(self.cfg).compute(
                        image_bgr, arrays_to_keypoints(kp_dev))
                    if host_desc is None:
                        host_desc = np.zeros((0, 128), np.float32)
                    host_desc = host_desc.astype(np.uint8)
                    kp = keypoints_to_arrays(kps_cv)
            else:
                kp, host_desc = detect_and_describe(
                    image_bgr, self.cfg, max_keypoints, train_topup, rng
                )
        elif self.cfg.detector == "device" and not train_topup:
            from gims_tpu.frontend.detect_device import detect_device

            mk = max_keypoints if max_keypoints and max_keypoints > 0 \
                else (bucket or 12288)
            kp, _padded = detect_device(
                image_bgr, mk, self.cfg.contrast_threshold,
                self.cfg.edge_threshold,
            )
        else:
            kp = detect(image_bgr, self.cfg, max_keypoints, train_topup, rng)
        n = len(kp)
        nb = bucket if bucket is not None else bucket_size(n, DEFAULT_BUCKETS)
        if n > nb:
            kp = KeypointArrays(*(a[:nb] for a in (
                kp.pt, kp.size, kp.angle, kp.response, kp.octave, kp.layer,
                kp.scale)))
            if host_desc is not None:
                host_desc = host_desc[:nb]
            n = nb
        t1 = time.perf_counter()
        if dev_sift:
            from gims_tpu.frontend.detect_device import (
                _blur_cache,
                build_gray_blur,
            )
            from gims_tpu.frontend.sift_descriptor import describe_device

            h, w = image_bgr.shape[:2]
            if (h, w) not in _blur_cache:
                _blur_cache[(h, w)] = build_gray_blur(h, w)
            pyr = _gray_pyr_jit(jnp.asarray(image_bgr), h, w,
                                _blur_cache[(h, w)])
            t2 = time.perf_counter()
            desc128 = describe_device(pyr, kp, nb, self.cfg.sift_samples)
            desc256 = _normalize_duplicate(desc128)
            t3 = time.perf_counter()
        elif host_desc is not None:
            pad = np.zeros((nb, 128), np.uint8)
            pad[:n] = host_desc
            t2 = time.perf_counter()
            # ship uint8 (4x less tunnel traffic), normalize + duplicate
            # to 256-d on device
            desc256 = _normalize_duplicate(jnp.asarray(pad))
            t3 = time.perf_counter()
        elif self.dense_gray is not None:
            t2 = time.perf_counter()
            desc128 = self.dense_gray.compute(image_bgr, kp, nb)
            desc256 = jnp.concatenate([desc128, desc128], axis=1)
            t3 = time.perf_counter()
        elif self.dense is not None:
            h, w = image_bgr.shape[:2]
            pyramid = pyramid_from_uint8(jnp.asarray(image_bgr), h, w)
            t2 = time.perf_counter()
            desc128 = self.dense.compute(pyramid, kp, nb)
            desc256 = jnp.concatenate([desc128, desc128], axis=1)
            t3 = time.perf_counter()
        else:
            h, w = image_bgr.shape[:2]
            pyramid = pyramid_from_uint8(jnp.asarray(image_bgr), h, w)
            patches = extract_patches_device(
                pyramid, kp, nb, self.cfg.interpolation, self.cfg.warp_size
            )
            t2 = time.perf_counter()
            desc128 = self.engine.compute_device(patches)
            desc256 = jnp.concatenate([desc128, desc128], axis=1)
            t3 = time.perf_counter()

        kpts = np.full((nb, 2), 1e6, np.float32)
        kpts[:n] = kp.pt
        scores = np.zeros((nb,), np.float32)
        scores[:n] = kp.response
        valid = np.zeros((nb,), bool)
        valid[:n] = True
        self.timings = {
            "detect": t1 - t0, "patches": t2 - t1, "descriptors": t3 - t2,
        }
        return {
            "kpts": jnp.asarray(kpts),
            "desc": desc256,
            "valid": jnp.asarray(valid),
            "scores": scores,
            "kp": kp,
            "n": n,
        }
