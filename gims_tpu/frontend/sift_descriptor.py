"""On-device SIFT descriptors — TPU-first.

The reference describes keypoints with CAR-HyNet; this repo's in-env
substitute descriptor engine is raw OpenCV SIFT (`descriptor_source=
"sift"`, frontend/sift.py), whose host `cv2.SIFT.compute` costs ~0.8 s
per image on this host's single core — the throughput ceiling of the
best-quality recorded config (device-DoG detector + SIFT descriptors,
docs/bench/bench_r4_devdet.json: 1.59 s/pair of host descriptor time).

This module computes the SIFT descriptor on the TPU as fixed-shape ops.
OpenCV's calcSIFTDescriptor (the behavioral spec; the reference consumes
it through cv2 — reference: utils/common.py:851-893) walks every integer
pixel in a rotated, scale-proportional radius and trilinearly votes
gradient magnitudes into a 4x4x8 histogram. A data-dependent radius is
shape-dynamic, so the TPU version replaces the integer-pixel walk with a
FIXED SxS sample grid, uniform in the rotated histogram frame:

  1. per-octave gradient maps (dx = I(r,c+1)-I(r,c-1), dy =
     I(r-1,c)-I(r+1,c) — cv2's differences, zero at borders) for pyramid
     layers 1..3, packed as 2-channel quad rows (frontend/patches.py
     layout: one gather row fetches a bilinear tap block);
  2. per keypoint, S^2 sample positions px + hist_width * R(ori) @ grid
     with hist_width = 3 * scl (SIFT_DESCR_SCL_FCTR), grid covering
     (-2.5, 2.5) histogram units — exactly the rbin/cbin support cv2's
     radius walk can contribute to;
  3. bilinear gradient sampling (one quad-row gather per sample),
     orientation bins (Ori - ori) * 8/360 with wraparound, Gaussian
     weight exp(-(c_rot^2+r_rot^2)/8) — FIXED per grid position;
  4. the spatial trilinear vote is a CONSTANT (S^2, 16) matrix (the grid
     is uniform in histogram space), so accumulation is one matmul:
     desc[k, cell, obin] = sum_s contrib[k, s, obin] * M[s, cell];
  5. cv2's finalization verbatim: L2 norm, clip at 0.2*norm,
     rescale by 512/norm', round, clamp to [0, 255].

Differences vs cv2 (measured in tests/test_sift_descriptor.py): samples
sit on a rotated uniform grid instead of the integer lattice (cv2's
sample count per bin is 3*scl and varies with scale; ours is fixed at
S/5 per bin axis), and the keypoint center is not rounded to an integer
pixel. Descriptors agree with cv2's to high cosine similarity; exact
bit parity is impossible under static shapes.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from gims_tpu.frontend.patches import quad_rows_from_levels
from gims_tpu.frontend.sift import KeypointArrays

D = 4                 # SIFT_DESCR_WIDTH
NBINS = 8             # SIFT_DESCR_HIST_BINS
SCL_FCTR = 3.0        # SIFT_DESCR_SCL_FCTR
MAG_THR = 0.2         # SIFT_DESCR_MAG_THR
INT_FCTR = 512.0      # SIFT_INT_DESCR_FCTR
FLT_EPSILON = 1.19209e-07
SAMPLES = 16          # default sample-grid side (S): S/5 samples per bin
DESC_CHUNK = 1024     # keypoints per compiled chunk
KP_BUCKETS = (64, 256, 1024, 4096, 8192, 16384, 32768)


def grad_levels(gauss: jnp.ndarray) -> jnp.ndarray:
    """(6, H, W) gray octave -> (3, H, W, 2) gradient maps for layers 1..3.

    cv2's differences (sift.cpp calcSIFTDescriptor): dx = I(r, c+1) -
    I(r, c-1), dy = I(r-1, c) - I(r+1, c) (y-up), defined only for
    r, c in [1, rows-2]; the border ring is zero so out-of-range samples
    contribute nothing (cv2 skips them)."""
    g = gauss[1:4]
    dx = jnp.zeros_like(g)
    dy = jnp.zeros_like(g)
    dx = dx.at[:, :, 1:-1].set(g[:, :, 2:] - g[:, :, :-2])
    dy = dy.at[:, 1:-1, :].set(g[:, :-2, :] - g[:, 2:, :])
    dx = dx.at[:, 0, :].set(0.0).at[:, -1, :].set(0.0)
    dy = dy.at[:, :, 0].set(0.0).at[:, :, -1].set(0.0)
    return jnp.stack([dx, dy], axis=-1)


@functools.lru_cache(maxsize=8)
def _grid_constants(s: int):
    """Fixed per-grid-position constants: rotated-frame coordinates,
    Gaussian weight, and the (S^2, 16) spatial trilinear vote matrix."""
    u = ((np.arange(s) + 0.5) * (2.0 * (D + 1) / 2.0 / s)
         - (D + 1) / 2.0).astype(np.float32)          # (-2.5, 2.5)
    c_rot = np.tile(u, s)                              # (S^2,) x-fast
    r_rot = np.repeat(u, s)
    w = np.exp(-(c_rot**2 + r_rot**2) / (0.5 * D * D)).astype(np.float32)
    rbin = r_rot + D / 2 - 0.5
    cbin = c_rot + D / 2 - 0.5
    m = np.zeros((s * s, D * D), np.float32)
    for r in range(D):
        wr = np.maximum(0.0, 1.0 - np.abs(rbin - r))
        for c in range(D):
            wc = np.maximum(0.0, 1.0 - np.abs(cbin - c))
            m[:, r * D + c] = wr * wc
    return c_rot, r_rot, w, m


def _finalize(desc: jnp.ndarray) -> jnp.ndarray:
    """cv2's descriptor normalization: clip at 0.2 * ||v||, rescale to
    512/||v'||, round, clamp to [0, 255] (saturate_cast<uchar>)."""
    nrm = jnp.sqrt(jnp.sum(jnp.square(desc), axis=-1, keepdims=True))
    desc = jnp.minimum(desc, MAG_THR * nrm)
    nrm2 = jnp.sqrt(jnp.sum(jnp.square(desc), axis=-1, keepdims=True))
    sf = INT_FCTR / jnp.maximum(nrm2, FLT_EPSILON)
    return jnp.clip(jnp.round(desc * sf), 0.0, 255.0)


def _descr_chunk(grad_quads, h, w, level_idx, px, py, scl, angle, valid,
                 s: int = SAMPLES):
    """One fixed-size keypoint chunk -> (k, 128) descriptors.

    grad_quads: quad rows of a (3, h, w, 2) gradient stack. px/py are
    octave-local pixel coords, scl = size_at_octave * 0.5 (the keypoint
    sigma in octave pixels), angle in cv2's degree convention.
    """
    k = level_idx.shape[0]
    c_rot, r_rot, gw, m = _grid_constants(s)
    c_rot = jnp.asarray(c_rot)
    r_rot = jnp.asarray(r_rot)

    ori = 360.0 - angle
    ori = jnp.where(jnp.abs(ori - 360.0) < FLT_EPSILON, 0.0, ori)
    orad = jnp.deg2rad(ori)
    cos_t = jnp.cos(orad)[:, None]
    sin_t = jnp.sin(orad)[:, None]
    hist_width = (SCL_FCTR * scl)[:, None]

    # sample positions: [j; i] = R(ori)^T [c_rot; r_rot] * hist_width
    sx = px[:, None] + hist_width * (cos_t * c_rot[None] + sin_t * r_rot[None])
    sy = py[:, None] + hist_width * (-sin_t * c_rot[None] + cos_t * r_rot[None])

    fx = jnp.floor(sx)
    fy = jnp.floor(sy)
    tx = sx - fx
    ty = sy - fy
    ix = fx.astype(jnp.int32)
    iy = fy.astype(jnp.int32)

    # one quad row covers the 2x2 bilinear tap block (patches.py layout)
    qy = iy + 1
    qx = ix + 1
    ok = (qy >= 0) & (qy <= h) & (qx >= 0) & (qx <= w)
    qyc = jnp.clip(qy, 0, h)
    qxc = jnp.clip(qx, 0, w)
    if grad_quads.ndim == 4:
        # native-layout (L, h+1, w+1, 8) table: gather rows by 3-D index.
        # Flattening that array to (L*(h+1)*(w+1), 8) first is a pure
        # retiling copy that costs ~6 ms/side at the upsampled octave
        # (scripts/profile_devsift_extract3.py: 23 ms/batch of the 24.8
        # total); lax.gather fetches the same 8-value rows straight out
        # of the image-layout operand. Row values are bit-identical.
        kk, ss = qyc.shape
        starts = jnp.stack(
            [jnp.broadcast_to(level_idx[:, None], (kk, ss)), qyc, qxc],
            axis=-1).reshape(kk * ss, 3)
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(1,), collapsed_slice_dims=(0, 1, 2),
            start_index_map=(0, 1, 2))
        vals = jax.lax.gather(
            grad_quads, starts, dn,
            slice_sizes=(1, 1, 1, grad_quads.shape[-1]),
            mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
        ).reshape(kk, ss, grad_quads.shape[-1])       # (k, S^2, 8)
    else:
        nquads = (h + 1) * (w + 1)
        idx = level_idx[:, None] * nquads + qyc * (w + 1) + qxc
        vals = jnp.take(grad_quads, idx, axis=0)      # (k, S^2, 8)
    okf = ok.astype(jnp.float32)
    w00 = (1.0 - ty) * (1.0 - tx) * okf
    w01 = (1.0 - ty) * tx * okf
    w10 = ty * (1.0 - tx) * okf
    w11 = ty * tx * okf
    gdx = (vals[..., 0] * w00 + vals[..., 2] * w01
           + vals[..., 4] * w10 + vals[..., 6] * w11)
    gdy = (vals[..., 1] * w00 + vals[..., 3] * w01
           + vals[..., 5] * w10 + vals[..., 7] * w11)

    mag = jnp.sqrt(gdx * gdx + gdy * gdy)
    grad_deg = jnp.degrees(jnp.arctan2(gdy, gdx)) % 360.0
    obin = (grad_deg - ori[:, None]) * (NBINS / 360.0)
    o0 = jnp.floor(obin)
    fo = obin - o0
    o0i = jnp.mod(o0.astype(jnp.int32), NBINS)
    contrib = mag * jnp.asarray(gw)[None, :]          # (k, S^2)

    oh0 = jax.nn.one_hot(o0i, NBINS, dtype=jnp.float32)
    oh1 = jax.nn.one_hot((o0i + 1) % NBINS, NBINS, dtype=jnp.float32)
    votes = contrib[..., None] * (
        oh0 * (1.0 - fo)[..., None] + oh1 * fo[..., None]
    )                                                  # (k, S^2, 8)
    desc = jnp.einsum("kso,sp->kpo", votes, jnp.asarray(m))
    desc = desc.reshape(k, D * D * NBINS)              # (r*4+c)*8+o — cv2 order
    return _finalize(desc) * valid[:, None]


@functools.partial(jax.jit, static_argnums=(1, 2, 8))
def describe_chunk(grad_quads, h, w, level_idx, px, py, scl, angle,
                   s: int = SAMPLES):
    """Standalone jitted chunk (host-grouped staged path / tests)."""
    valid = jnp.ones_like(px)
    return _descr_chunk(grad_quads, h, w, level_idx, px, py, scl, angle,
                        valid, s)


_grad_quads_jit = jax.jit(lambda g: quad_rows_from_levels(grad_levels(g)))


@functools.partial(jax.jit, donate_argnums=(0,))
def _scatter_desc(out, sel, desc):
    return out.at[sel].set(desc)


def describe_device(pyramid_gray, kp: KeypointArrays, out_bucket: int,
                    s: int = SAMPLES):
    """All keypoints -> DEVICE (out_bucket, 128) f32 SIFT descriptors.

    pyramid_gray: sequence of (6, H_o, W_o) gray octaves (gray_pyramid
    output, firstOctave=-1 layout: index = kp.octave + 1). Groups
    keypoints by octave on the host and runs fixed-size compiled chunks,
    mirroring patches.extract_patches_device.
    """
    n = len(kp)
    out = jnp.zeros((out_bucket, D * D * NBINS), jnp.float32)
    if n == 0:
        return out
    oct_index = kp.octave + 1
    scl_all = kp.size * kp.scale * 0.5
    px_all = kp.pt[:, 0] * kp.scale
    py_all = kp.pt[:, 1] * kp.scale
    for o in range(len(pyramid_gray)):
        osel = np.nonzero(oct_index == o)[0]
        osel = osel[osel < out_bucket]
        if osel.size == 0:
            continue
        lvh, lvw = int(pyramid_gray[o].shape[1]), int(pyramid_gray[o].shape[2])
        quads = _grad_quads_jit(pyramid_gray[o])
        nchunks = -(-osel.size // DESC_CHUNK)
        kb = nchunks * DESC_CHUNK
        lv = np.zeros((kb,), np.int32)
        pxc = np.zeros((kb,), np.float32)
        pyc = np.zeros((kb,), np.float32)
        sc = np.ones((kb,), np.float32)
        an = np.zeros((kb,), np.float32)
        selp = np.full((kb,), out_bucket, np.int32)    # OOB rows dropped
        lv[: osel.size] = kp.layer[osel] - 1           # grad stack = layers 1..3
        pxc[: osel.size] = px_all[osel]
        pyc[: osel.size] = py_all[osel]
        sc[: osel.size] = scl_all[osel]
        an[: osel.size] = kp.angle[osel]
        selp[: osel.size] = osel
        for i in range(nchunks):
            sl = slice(i * DESC_CHUNK, (i + 1) * DESC_CHUNK)
            desc = describe_chunk(
                quads, lvh, lvw, jnp.asarray(lv[sl]), jnp.asarray(pxc[sl]),
                jnp.asarray(pyc[sl]), jnp.asarray(sc[sl]),
                jnp.asarray(an[sl]), s,
            )
            out = _scatter_desc(out, jnp.asarray(selp[sl]), desc)
    return out


def describe(pyramid_gray, kp: KeypointArrays, s: int = SAMPLES) -> np.ndarray:
    """Host-output variant: (N, 128) f32 (cv2-range integer values)."""
    from gims_tpu.core.bucketing import bucket_size

    n = len(kp)
    if n == 0:
        return np.zeros((0, D * D * NBINS), np.float32)
    dev = describe_device(pyramid_gray, kp, bucket_size(n, KP_BUCKETS), s)
    return np.asarray(dev)[:n]
