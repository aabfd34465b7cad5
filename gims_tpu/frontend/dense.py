"""Dense descriptor frontend: convolutional CAR-HyNet over pyramid levels.

TPU-first replacement for the per-keypoint patch pipeline (reference:
utils/library.py:84-110 `ComputePatches` + carhynet/models.py:655-665
batched patch CNN): instead of gathering one warped 32x32 patch per
keypoint (12.6M row-gathers/image at eval scale — the round-1 device
bottleneck), run the SAME CAR-HyNet weights fully convolutionally over
the keypoint-bearing pyramid levels (pure MXU conv work), producing a
stride-4 descriptor map per (octave, layer), then bilinearly sample one
128-d descriptor per keypoint (~4 row-gathers each).

Geometry: a keypoint (pt, octave, layer, scale) reads level coords
p = pt * scale (same convention as patches.inverse_affines); the dense
map is stride 4 with a +2px center offset from the SAME-padded 8x8 final
conv, so map coords m = (p - 2) / 4. Rotation alignment (patch mode
rotates by kp.angle) is intentionally dropped — descriptors must be
trained rotation-robust (the training augmentation covers +-25 degrees).
"""

from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from gims_tpu.carhynet.model import CARHyNet
from gims_tpu.frontend.sift import KeypointArrays

# keypoints live in layers 1..3 (unpackSIFTOctave; OpenCV localizes
# extrema between layers 1 and nOctaveLayers)
KP_LAYERS: Tuple[int, ...] = (1, 2, 3)
MIN_LEVEL_SIDE = 16  # skip octaves smaller than this (no real keypoints)


def map_dims(h: int, w: int) -> Tuple[int, int]:
    """Output dims of the stride-4 dense map for an (h, w) level."""
    h2, w2 = -(-h // 2), -(-w // 2)
    return -(-h2 // 2), -(-w2 // 2)


def dense_meta(pyramid_shapes: Sequence[Tuple[int, int]]):
    """Row offsets of each (octave, layer) map inside the flat buffer.

    pyramid_shapes: [(H_o, W_o)] per octave (largest first).
    Returns (offsets (n_oct, len(KP_LAYERS)) int64, dims [(mh, mw)],
    total_rows).
    """
    offsets = []
    dims = []
    total = 0
    for (h, w) in pyramid_shapes:
        if min(h, w) < MIN_LEVEL_SIDE:
            break
        mh, mw = map_dims(h, w)
        row = []
        for _ in KP_LAYERS:
            row.append(total)
            total += mh * mw
        offsets.append(row)
        dims.append((mh, mw))
    return np.asarray(offsets, np.int64), dims, total


def dense_feature_maps(pyramid, variables, dim_desc: int = 128,
                       dtype=jnp.float32):
    """Run dense CAR-HyNet over layers 1..3 of every usable octave.

    pyramid: sequence of (6, H_o, W_o, C) f32 level stacks (0..255 range,
    as produced by pyramid_from_uint8).
    Returns the flat (total_rows, dim_desc) descriptor-map buffer. Must be
    called under jit (shapes are static per image size).
    """
    model = CARHyNet(dim_desc=dim_desc, dense=True)
    chunks = []
    for o in range(len(pyramid)):
        h, w = int(pyramid[o].shape[1]), int(pyramid[o].shape[2])
        if min(h, w) < MIN_LEVEL_SIDE:
            break
        levels = pyramid[o][KP_LAYERS[0]:KP_LAYERS[-1] + 1].astype(dtype) / 255.0
        maps = model.apply(variables, levels, train=False)  # (3, mh, mw, D)
        chunks.append(maps.reshape(-1, dim_desc))
    return jnp.concatenate(chunks, axis=0)


def sample_plan(kp: KeypointArrays, offsets: np.ndarray,
                dims: List[Tuple[int, int]], nb: int):
    """Host-side gather plan: (nb, 4) int32 tap rows + (nb, 4) f32 weights.

    Bilinear taps are clamped to the map interior; keypoints whose octave
    exceeds the processed range get zero weights (descriptor = 0).
    """
    n = min(len(kp), nb)
    rows = np.zeros((nb, 4), np.int64)
    wts = np.zeros((nb, 4), np.float32)
    if n == 0:
        return rows.astype(np.int32), wts
    o_idx = (kp.octave[:n] + 1).astype(np.int64)
    layer = np.clip(kp.layer[:n], KP_LAYERS[0], KP_LAYERS[-1]) - KP_LAYERS[0]
    ok = (o_idx >= 0) & (o_idx < len(dims))
    o_safe = np.clip(o_idx, 0, len(dims) - 1)
    base = offsets[o_safe, layer]
    mh = np.asarray([d[0] for d in dims], np.int64)[o_safe]
    mw = np.asarray([d[1] for d in dims], np.int64)[o_safe]

    p = kp.pt[:n] * kp.scale[:n, None]       # level coords
    mx = (p[:, 0] - 2.0) / 4.0
    my = (p[:, 1] - 2.0) / 4.0
    x0 = np.floor(mx)
    y0 = np.floor(my)
    fx = (mx - x0).astype(np.float32)
    fy = (my - y0).astype(np.float32)
    x0 = x0.astype(np.int64)
    y0 = y0.astype(np.int64)
    for t, (dy, dx) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
        xx = np.clip(x0 + dx, 0, mw - 1)
        yy = np.clip(y0 + dy, 0, mh - 1)
        rows[:n, t] = base + yy * mw + xx
        wx = (1.0 - fx) if dx == 0 else fx
        wy = (1.0 - fy) if dy == 0 else fy
        wts[:n, t] = np.where(ok, wx * wy, 0.0)
    return rows.astype(np.int32), wts


@jax.jit
def gather_descriptors(buffer, rows, wts):
    """(R, D) buffer + (nb, 4) taps/weights -> (nb, D) renormalized.

    4 narrow row-gathers per keypoint — the shape the TPU gather unit is
    fastest at (row-count-bound up to ~192-wide rows).
    """
    taps = jnp.take(buffer, rows.reshape(-1), axis=0)
    taps = taps.reshape(rows.shape[0], 4, -1)
    d = jnp.sum(taps * wts[:, :, None], axis=1)
    norm = jnp.sqrt(jnp.sum(jnp.square(d), axis=-1, keepdims=True) + 1e-10)
    return d / norm


class DenseDescriptorFrontend:
    """Stateful wrapper: caches the jitted map builder per image shape."""

    def __init__(self, variables, dim_desc: int = 128):
        self.variables = variables
        self.dim_desc = dim_desc

        @functools.partial(jax.jit, static_argnums=())
        def _maps(vars_, pyramid):
            return dense_feature_maps(pyramid, vars_, dim_desc)

        self._maps = _maps

    def compute(self, pyramid, kp: KeypointArrays, nb: int):
        """pyramid (device) + keypoints -> (nb, dim_desc) device descs."""
        shapes = [(int(p.shape[1]), int(p.shape[2])) for p in pyramid]
        offsets, dims, _ = dense_meta(shapes)
        buffer = self._maps(self.variables, tuple(pyramid))
        rows, wts = sample_plan(kp, offsets, dims, nb)
        return gather_descriptors(buffer, jnp.asarray(rows),
                                  jnp.asarray(wts))


def sample_plan_gray(kp: KeypointArrays, offsets: np.ndarray,
                     dims: List[Tuple[int, int]], nb: int, first: int):
    """Gather plan for the dense_gray geometry (see fused._extract_side):
    maps exist for pyramid octaves `first`..`first+len(dims)-1`; a keypoint
    outside that range samples the nearest available octave's map at
    rescaled coordinates (octave-src level coords p = pt * 2^(1-src))."""
    n = min(len(kp), nb)
    rows = np.zeros((nb, 4), np.int64)
    wts = np.zeros((nb, 4), np.float32)
    if n == 0:
        return rows.astype(np.int32), wts
    o_idx = (kp.octave[:n] + 1).astype(np.int64)
    layer = np.clip(kp.layer[:n], KP_LAYERS[0], KP_LAYERS[-1]) - KP_LAYERS[0]
    src = np.clip(o_idx, first, first + len(dims) - 1)
    base = offsets[src - first, layer]
    mh = np.asarray([d[0] for d in dims], np.int64)[src - first]
    mw = np.asarray([d[1] for d in dims], np.int64)[src - first]

    p = kp.pt[:n] * (2.0 ** (1 - src))[:, None]   # octave-src level coords
    mx = (p[:, 0] - 2.0) / 4.0
    my = (p[:, 1] - 2.0) / 4.0
    x0 = np.floor(mx)
    y0 = np.floor(my)
    fx = (mx - x0).astype(np.float32)
    fy = (my - y0).astype(np.float32)
    x0 = x0.astype(np.int64)
    y0 = y0.astype(np.int64)
    for t, (dy, dx) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
        xx = np.clip(x0 + dx, 0, mw - 1)
        yy = np.clip(y0 + dy, 0, mh - 1)
        rows[:n, t] = base + yy * mw + xx
        wx = (1.0 - fx) if dx == 0 else fx
        wy = (1.0 - fy) if dy == 0 else fy
        wts[:n, t] = wx * wy
    return rows.astype(np.int32), wts


class DenseGrayDescriptorFrontend:
    """dense_gray descriptors for HOST-detected keypoints (training/staged
    path) with the exact geometry of the fused extractor: in_channels=1
    CAR-HyNet over the gray DETECTION pyramid (detect_device.gray_pyramid
    — 2x upsample + initial blur), octaves 1.. only; octave-0 keypoints
    sample octave 1 at halved coordinates."""

    def __init__(self, variables, dim_desc: int = 128,
                 dtype: str = "bfloat16"):
        from gims_tpu.carhynet.model import CARHyNet

        self.dim_desc = dim_desc
        ddt = jnp.dtype(dtype) if dtype != "float32" else jnp.float32
        if ddt != jnp.float32:
            variables = jax.tree_util.tree_map(
                lambda p: p.astype(ddt)
                if jnp.issubdtype(p.dtype, jnp.floating) else p,
                variables,
            )
        self.variables = variables
        model = CARHyNet(dim_desc=dim_desc, dense=True, in_channels=1)

        self._blur_cache = {}

        @functools.partial(jax.jit, static_argnums=(2, 3))
        def _maps(vars_, image_u8, h, w, blur=None):
            from gims_tpu.frontend.detect_device import gray_pyramid

            octs = gray_pyramid(image_u8, h, w, blur)
            first = 1 if len(octs) > 1 else 0
            chunks = []
            for o in range(first, len(octs)):
                if min(int(octs[o].shape[1]), int(octs[o].shape[2])) < 16:
                    break
                levels = octs[o][1:4][..., None].astype(ddt) / 255.0
                maps = model.apply(vars_, levels, train=False)
                chunks.append(maps.reshape(-1, dim_desc))
            return jnp.concatenate(chunks, axis=0)

        self._maps = _maps

    def meta(self, h: int, w: int):
        """(offsets, dims, first) for an (h, w) input image."""
        from gims_tpu.frontend.pyramid import num_octaves

        n_oct = num_octaves(2 * h, 2 * w)
        shapes = []
        hh, ww = 2 * h, 2 * w
        for _ in range(n_oct):
            shapes.append((hh, ww))
            # next octave = [::2, ::2] slicing of this one (ceil halving)
            hh, ww = (hh + 1) // 2, (ww + 1) // 2
        first = 1 if n_oct > 1 else 0
        offsets, dims, _ = dense_meta(shapes[first:])
        return offsets, dims, first

    def compute(self, image_u8_np: np.ndarray, kp: KeypointArrays, nb: int):
        """Host image + host keypoints -> (nb, dim_desc) device descs."""
        from gims_tpu.frontend.detect_device import build_gray_blur

        h, w = image_u8_np.shape[:2]
        offsets, dims, first = self.meta(h, w)
        if (h, w) not in self._blur_cache:
            self._blur_cache[(h, w)] = build_gray_blur(h, w)
        buffer = self._maps(self.variables, jnp.asarray(image_u8_np), h, w,
                            self._blur_cache[(h, w)])
        rows, wts = sample_plan_gray(kp, offsets, dims, nb, first)
        return gather_descriptors(buffer, jnp.asarray(rows),
                                  jnp.asarray(wts))
