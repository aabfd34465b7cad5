"""On-device SIFT keypoint detection (DoG extrema) — TPU-first.

The reference (and this framework's default path) detects keypoints with
OpenCV on the host CPU (reference: utils/common.py:851-862). On this
environment's single host core that costs ~0.24 s per 800x600 image and is
the end-to-end throughput ceiling (BENCH: frontend_detect ~0.48 s/pair).
This module runs the whole detection on the TPU as dense fixed-shape ops:

  1. grayscale base, 2x upsample, initial blur to sigma=1.6 (OpenCV
     createInitialImage: sqrt(1.6^2 - 4*0.25) on the doubled image),
  2. Gaussian pyramid (same incremental sigmas as frontend/pyramid.py),
  3. DoG; 26-neighbor extrema via 3x3 max/min pooling over scale triplets,
  4. one dense Newton step of the 3x3 quadratic fit per pixel
     (offset = -H^-1 grad, closed-form adjugate solve) with OpenCV's
     contrast (|D_hat| * nLayers >= contrastThreshold) and edge
     (tr^2/det < (r+1)^2/r) tests,
  5. orientation from Gaussian-smoothed gradients at the keypoint's
     (octave, layer): angle = 360 - atan2(-gy, gx) in degrees — a
     rotation-covariant mean-gradient estimate replacing OpenCV's 36-bin
     histogram peak (dense: two blurs per layer, no per-keypoint windows;
     multi-modal neighborhoods may differ from cv2),
  6. per-octave top-k by |contrast| then a global top-k to the requested
     keypoint budget — fixed output shapes, mask for validity.

Differences vs OpenCV (documented, covered by tests/test_detect_device.py):
only first-Newton-step-converged extrema are kept (OpenCV relocates up to
5 times — recovers a few % more points), no sub-scale duplicate removal,
and the orientation estimator above. The host cv2 path remains the parity
default; this is the speed path for bench/serving.
"""

from __future__ import annotations

import functools
import math
from typing import List, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from gims_tpu.frontend.pyramid import (
    N_OCTAVE_LAYERS,
    SIGMA,
    blur_sigmas,
    gaussian_kernel_1d,
    num_octaves,
    upsample2x,
)

IMG_BORDER = 5          # OpenCV SIFT_IMG_BORDER
MAX_INTERP_STEPS = 1    # dense single-step fit (see module docstring)
# numpy scalar: a module-level jnp scalar dispatches to the device at
# import time (hangs every import when the axon tunnel is down).
NEG = np.float32(-1.0)


def _sep_blur_hw(img: jnp.ndarray, kern: jnp.ndarray) -> jnp.ndarray:
    """Separable blur on a single-channel (H, W) f32 image, REFLECT_101."""
    k = kern.shape[0]
    half = k // 2
    x = jnp.pad(img, ((half, half), (half, half)), mode="reflect")
    x = x[None, :, :, None]
    kv = kern.reshape(k, 1, 1, 1)
    kh = kern.reshape(1, k, 1, 1)
    dn = jax.lax.conv_dimension_numbers(x.shape, kv.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    x = jax.lax.conv_general_dilated(x, kv, (1, 1), "VALID",
                                     dimension_numbers=dn)
    dn = jax.lax.conv_dimension_numbers(x.shape, kh.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    x = jax.lax.conv_general_dilated(x, kh, (1, 1), "VALID",
                                     dimension_numbers=dn)
    return x[0, :, :, 0]


def gray_kernels(upsample: bool = True):
    """1-D kernels of the detection pyramid blur chain: index 0 = the
    initial blur to sigma on the base grid (doubled when upsample, else
    the input grid with assumed camera sigma 0.5), 1..5 = incremental
    sigmas."""
    base_var = 4 * 0.25 if upsample else 0.25
    sig_diff = math.sqrt(max(SIGMA**2 - base_var, 0.01))
    return [gaussian_kernel_1d(sig_diff)] + [
        gaussian_kernel_1d(s) for s in blur_sigmas()[1:]
    ]


def build_gray_blur(h: int, w: int, upsample: bool = True):
    """Device band-matrix pytree for gray_pyramid(blur=...) at (h, w).

    {"init": (bh, bw) for the base, "oct": [per octave:
    [(bh, bw) for kernels 1..5]]}. ~110 MB HBM at 800x600; built once per
    process per image shape (matrices constructed on device — nothing
    O(n^2) crosses the tunnel or bloats the executable).
    """
    from gims_tpu.frontend.blurmat import BlurMats

    kerns = gray_kernels(upsample)
    bm = BlurMats(kerns)
    # orientation-map smoothing kernels (sigma = 1.5 * layer scale):
    # as depthwise convs these dominate the devsift/patch-warp extract
    # (59 ms/side at the 1600x1200 octave vs 5.7 ms for the WHOLE
    # pyramid's banded matmuls — scripts/profile_devsift_extract.py);
    # the same MXU formulation takes them off the critical path.
    ori_base = len(bm.kernels)
    bm.kernels.extend(
        gaussian_kernel_1d(1.5 * SIGMA * 2.0 ** (l / N_OCTAVE_LAYERS))
        for l in range(1, N_OCTAVE_LAYERS + 1)
    )
    hh, ww = (2 * h, 2 * w) if upsample else (h, w)
    n_oct = num_octaves(hh, ww)
    oct_mats = []
    ori_mats = []
    init = (bm.get(hh, 0), bm.get(ww, 0))
    for _o in range(n_oct):
        oct_mats.append([(bm.get(hh, ki), bm.get(ww, ki))
                         for ki in range(1, N_OCTAVE_LAYERS + 3)])
        ori_mats.append([(bm.get(hh, ori_base + i), bm.get(ww, ori_base + i))
                         for i in range(N_OCTAVE_LAYERS)])
        hh, ww = (hh + 1) // 2, (ww + 1) // 2
    return {"init": init, "oct": oct_mats, "ori": ori_mats}


def gray_pyramid(image_u8: jnp.ndarray, h: int, w: int, blur=None,
                 upsample: bool = True):
    """uint8 (H, W, 3) BGR — or an already-gray (H, W) — -> list of
    (6, H>>o, W>>o) gray octaves.

    Matches OpenCV SIFT's detection pyramid: BGR2GRAY, 2x linear
    upsample (firstOctave=-1; upsample=False skips it — firstOctave=0,
    the fused speed path: ~4x less pyramid/DoG/candidate work), initial
    blur to reach sigma on the base grid.

    blur: optional build_gray_blur(h, w, upsample) pytree — blurs then
    run as banded matmuls on the MXU (exact cv2 parity, ~5x the
    single-channel conv path on TPU; see frontend/blurmat.py).
    Default: depthwise convs.
    """
    from gims_tpu.frontend.blurmat import sep_blur_matmul

    if image_u8.ndim == 2:
        gray = image_u8.astype(jnp.float32)
    else:
        bgr = image_u8.astype(jnp.float32)
        gray = (0.114 * bgr[..., 0] + 0.587 * bgr[..., 1]
                + 0.299 * bgr[..., 2])
    if upsample:
        base = upsample2x(gray[..., None])[..., 0]
        bh, bw = 2 * h, 2 * w
    else:
        base = gray
        bh, bw = h, w
    base_var = 4 * 0.25 if upsample else 0.25
    sig_diff = math.sqrt(max(SIGMA**2 - base_var, 0.01))
    if blur is not None:
        base = sep_blur_matmul(base, *blur["init"])
    else:
        base = _sep_blur_hw(base, jnp.asarray(gaussian_kernel_1d(sig_diff)))

    sigs = blur_sigmas()
    kerns = [jnp.asarray(gaussian_kernel_1d(s)) for s in sigs]
    octaves = []
    img = base
    for o in range(num_octaves(bh, bw)):
        layers = [img]
        for i in range(1, N_OCTAVE_LAYERS + 3):
            if blur is not None:
                layers.append(
                    sep_blur_matmul(layers[-1], *blur["oct"][o][i - 1]))
            else:
                layers.append(_sep_blur_hw(layers[-1], kerns[i]))
        octaves.append(jnp.stack(layers))
        img = layers[N_OCTAVE_LAYERS][::2, ::2]
    return octaves


def _pool3(x, op):
    """3x3 window max/min over the trailing two axes of (L, H, W)."""
    init = -jnp.inf if op == "max" else jnp.inf
    comp = jax.lax.max if op == "max" else jax.lax.min
    return jax.lax.reduce_window(
        x, init, comp, (1, 3, 3), (1, 1, 1), "SAME"
    )


def _octave_candidates(gauss, contrast_threshold, edge_threshold,
                       ori_grads=None):
    """Dense per-pixel extrema fit for one octave.

    gauss: (6, H, W). Returns dict of (3, H, W) maps: score (|contr|,
    -1 where invalid), offx, offy, offs, angle_deg. ori_grads may be None
    when the caller does not need orientations (the dense descriptor path
    drops rotation alignment) — "angle" is then absent from the result.
    """
    dog = gauss[1:] - gauss[:-1]             # (5, H, W)
    lh, hh, wh = dog.shape

    d0, d1, d2 = dog[:-2], dog[1:-1], dog[2:]   # lower/center/upper, (3,H,W)
    nb_max = jnp.maximum(jnp.maximum(_pool3(d0, "max"), _pool3(d1, "max")),
                         _pool3(d2, "max"))
    nb_min = jnp.minimum(jnp.minimum(_pool3(d0, "min"), _pool3(d1, "min")),
                         _pool3(d2, "min"))
    # prefilter threshold (OpenCV: cvFloor(0.5*ct/nLayers*255))
    thr = np.floor(0.5 * contrast_threshold / N_OCTAVE_LAYERS * 255.0)
    is_ext = ((d1 >= nb_max) & (d1 > thr)) | ((d1 <= nb_min) & (d1 < -thr))

    # first/second derivatives of the DoG cube at every pixel
    def sh(x, dy, dx):
        return jnp.roll(x, (-dy, -dx), axis=(-2, -1))

    dx = (sh(d1, 0, 1) - sh(d1, 0, -1)) * 0.5
    dy = (sh(d1, 1, 0) - sh(d1, -1, 0)) * 0.5
    ds = (d2 - d0) * 0.5
    dxx = sh(d1, 0, 1) + sh(d1, 0, -1) - 2 * d1
    dyy = sh(d1, 1, 0) + sh(d1, -1, 0) - 2 * d1
    dss = d2 + d0 - 2 * d1
    dxy = (sh(d1, 1, 1) - sh(d1, 1, -1) - sh(d1, -1, 1) + sh(d1, -1, -1)) * 0.25
    dxs = (sh(d2, 0, 1) - sh(d2, 0, -1) - sh(d0, 0, 1) + sh(d0, 0, -1)) * 0.25
    dys = (sh(d2, 1, 0) - sh(d2, -1, 0) - sh(d0, 1, 0) + sh(d0, -1, 0)) * 0.25

    # offset = -H^{-1} g by adjugate (H symmetric 3x3)
    c00 = dyy * dss - dys * dys
    c01 = dxs * dys - dxy * dss
    c02 = dxy * dys - dxs * dyy
    c11 = dxx * dss - dxs * dxs
    c12 = dxy * dxs - dxx * dys
    c22 = dxx * dyy - dxy * dxy
    det = dxx * c00 + dxy * c01 + dxs * c02
    safe = jnp.where(jnp.abs(det) > 1e-12, det, 1.0)
    offx = -(c00 * dx + c01 * dy + c02 * ds) / safe
    offy = -(c01 * dx + c11 * dy + c12 * ds) / safe
    offs = -(c02 * dx + c12 * dy + c22 * ds) / safe
    converged = (
        (jnp.abs(offx) < 0.5) & (jnp.abs(offy) < 0.5) & (jnp.abs(offs) < 0.5)
        & (jnp.abs(det) > 1e-12)
    )

    contr = (d1 + 0.5 * (dx * offx + dy * offy + ds * offs)) / 255.0
    contrast_ok = (
        jnp.abs(contr) * N_OCTAVE_LAYERS >= contrast_threshold
    )
    tr = dxx + dyy
    det2 = dxx * dyy - dxy * dxy
    e = edge_threshold
    edge_ok = (det2 > 0) & (tr * tr * e < (e + 1) * (e + 1) * det2)

    yy = jnp.arange(hh)[None, :, None]
    xx = jnp.arange(wh)[None, None, :]
    inside = (
        (yy >= IMG_BORDER) & (yy < hh - IMG_BORDER)
        & (xx >= IMG_BORDER) & (xx < wh - IMG_BORDER)
    )

    ok = is_ext & converged & contrast_ok & edge_ok & inside
    score = jnp.where(ok, jnp.abs(contr), NEG)
    out = {"score": score, "offx": offx, "offy": offy, "offs": offs}
    if ori_grads is not None:
        out["angle"] = ori_grads
    return out


def _orientation_maps(gauss, mats=None):
    """(6, H, W) -> (3, H, W) angle map per detection layer (degrees).

    Gaussian-smoothed mean gradient per layer l (sigma = 1.5 * 1.6 *
    2^(l/3), OpenCV's SIFT_ORI_SIG_FCTR times the layer scale), converted
    with cv2's angle convention: kp.angle = 360 - atan2(dy_up, dx).

    mats: optional build_gray_blur(...)["ori"][octave] — per-layer
    (bh, bw) band matrices; the smoothing then runs as MXU matmuls
    (~10x the depthwise-conv path at the upsampled octave)."""
    from gims_tpu.frontend.blurmat import sep_blur_matmul

    angles = []
    for layer in range(1, N_OCTAVE_LAYERS + 1):
        g = gauss[layer]
        gx = (jnp.roll(g, -1, axis=1) - jnp.roll(g, 1, axis=1)) * 0.5
        gy = (jnp.roll(g, -1, axis=0) - jnp.roll(g, 1, axis=0)) * 0.5
        if mats is not None:
            bh, bw = mats[layer - 1]
            if jax.default_backend() == "tpu":
                # bf16 MXU matmuls: the smoothed components only feed
                # atan2 — bf16's ~0.4% relative error is ~0.2 deg of
                # angle, far under the descriptor's 45-deg orientation
                # bins — and the halved temps keep the batched upsampled
                # devsift program inside HBM.
                bh16 = bh.astype(jnp.bfloat16)
                bw16 = bw.astype(jnp.bfloat16)
                gxs = (bh16.T @ gx.astype(jnp.bfloat16) @ bw16).astype(
                    jnp.float32)
                gys = (bh16.T @ gy.astype(jnp.bfloat16) @ bw16).astype(
                    jnp.float32)
            else:
                # f32 HIGH off-TPU: CPU's emulated-bf16 batched matmuls
                # accumulate in a different order than unbatched ones,
                # flipping angles at near-zero-gradient pixels and
                # breaking dispatch_batch vs dispatch bit-stability
                # (tests/test_fused.py::test_fused_batch_matches_single)
                gxs = sep_blur_matmul(gx, bh, bw)
                gys = sep_blur_matmul(gy, bh, bw)
        else:
            sig = 1.5 * SIGMA * (2.0 ** (layer / N_OCTAVE_LAYERS))
            kern = jnp.asarray(gaussian_kernel_1d(sig))
            gxs = _sep_blur_hw(gx, kern)
            gys = _sep_blur_hw(gy, kern)
        ori = jnp.degrees(jnp.arctan2(-gys, gxs))  # y-up like cv2
        ang = (360.0 - (ori % 360.0)) % 360.0
        angles.append(ang)
    return jnp.stack(angles)


def detect_device_padded(image_u8: jnp.ndarray, h: int, w: int,
                         max_keypoints: int,
                         contrast_threshold: float = 0.001,
                         edge_threshold: float = 80.0,
                         blur=None):
    """Full device detection. Returns dict of padded (K,) arrays:

    pt (K, 2) input-image xy, size, angle, response (f32), octave, layer
    (i32, octave unpacked >= -1), scale (f32), valid (bool). K =
    max_keypoints. Jit this per (h, w, K).
    """
    octaves = gray_pyramid(image_u8, h, w, blur)
    k_total = max_keypoints

    vals, attrs = [], []
    for o, gauss in enumerate(octaves):
        ori = _orientation_maps(
            gauss, blur["ori"][o]
            if blur is not None and "ori" in blur else None)
        cand = _octave_candidates(gauss, contrast_threshold, edge_threshold,
                                  ori)
        score = cand["score"].reshape(-1)
        k_o = min(k_total, score.shape[0])
        top_v, top_i = jax.lax.top_k(score, k_o)

        lh, hh, wh = cand["score"].shape
        li = top_i // (hh * wh)
        rem = top_i % (hh * wh)
        yi = rem // wh
        xi = rem % wh

        def g(m):
            return m.reshape(-1)[top_i]

        offx, offy, offs = g(cand["offx"]), g(cand["offy"]), g(cand["offs"])
        ang = g(cand["angle"])
        layer = li + 1  # detection layers are dog[1..3]

        scale_mult = float(2 ** (o - 1))  # 2^o * 0.5 (firstOctave = -1)
        px = (xi.astype(jnp.float32) + offx) * scale_mult
        py = (yi.astype(jnp.float32) + offy) * scale_mult
        size = (
            SIGMA
            * 2.0 ** ((layer.astype(jnp.float32) + offs) / N_OCTAVE_LAYERS)
            * float(2 ** o)  # 2^(o+1) * 0.5
        )
        if k_o < k_total:
            pad = k_total - k_o
            top_v = jnp.pad(top_v, (0, pad), constant_values=-1.0)
            px = jnp.pad(px, (0, pad))
            py = jnp.pad(py, (0, pad))
            size = jnp.pad(size, (0, pad))
            ang = jnp.pad(ang, (0, pad))
            layer = jnp.pad(layer, (0, pad))
        vals.append(top_v)
        attrs.append({
            "px": px, "py": py, "size": size, "angle": ang,
            "layer": layer.astype(jnp.int32),
            "octave": jnp.full((k_total,), o - 1, jnp.int32),
            "scale": jnp.full((k_total,), float(2 ** (1 - o)), jnp.float32),
        })

    all_v = jnp.concatenate(vals)
    top_v, top_i = jax.lax.top_k(all_v, k_total)
    stacked = {
        k: jnp.concatenate([a[k] for a in attrs])[top_i] for k in attrs[0]
    }
    valid = top_v > 0
    pt = jnp.stack([stacked["px"], stacked["py"]], axis=-1)
    pt = jnp.where(valid[:, None], pt, 1e6)
    return {
        "pt": pt,
        "size": jnp.where(valid, stacked["size"], 1.0),
        "angle": jnp.where(valid, stacked["angle"], 0.0),
        "response": jnp.where(valid, top_v, 0.0),
        "octave": jnp.where(valid, stacked["octave"], 0),
        "layer": jnp.where(valid, stacked["layer"], 1),
        "scale": jnp.where(valid, stacked["scale"], 1.0),
        "valid": valid,
    }


_jit_detect = functools.partial(jax.jit, static_argnums=(1, 2, 3, 4, 5))(
    detect_device_padded
)
_blur_cache = {}


def detect_device(image_u8_np: np.ndarray, max_keypoints: int,
                  contrast_threshold: float = 0.001,
                  edge_threshold: float = 80.0):
    """Host wrapper: returns (KeypointArrays of the valid prefix-compacted
    keypoints, padded device dict). One jit per (H, W, K)."""
    from gims_tpu.frontend.sift import KeypointArrays

    h, w = image_u8_np.shape[:2]
    if (h, w) not in _blur_cache:
        _blur_cache[(h, w)] = build_gray_blur(h, w)
    out = _jit_detect(
        jnp.asarray(image_u8_np), h, w, int(max_keypoints),
        float(contrast_threshold), float(edge_threshold),
        _blur_cache[(h, w)],
    )
    host = jax.device_get(out)
    m = np.asarray(host["valid"])
    kp = KeypointArrays(
        pt=np.asarray(host["pt"])[m],
        size=np.asarray(host["size"])[m],
        angle=np.asarray(host["angle"])[m],
        response=np.asarray(host["response"])[m],
        octave=np.asarray(host["octave"])[m],
        layer=np.asarray(host["layer"])[m],
        scale=np.asarray(host["scale"])[m],
    )
    return kp, out
