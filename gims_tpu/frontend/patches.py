"""Batched affine patch extraction on device.

Replaces the reference's per-keypoint cv2.warpAffine loop (reference:
utils/library.py:84-110 `ComputePatches` — the 3-4 s/image hot loop in
BASELINE.md) with one vmapped bicubic gather per octave: all keypoints of
an octave are warped by a single XLA program.

Geometry parity: for keypoint (pt, size, angle, octave, layer, scale) the
forward affine is A = R(deg2rad(360-angle))/step with step =
size*scale*0.5, translated so the rotated point lands at the patch center
r = (64-1)/2; the source level is pyramid[octave+1][layer]. cv2.warpAffine
inverts A internally, so we sample src = A^{-1} dst directly. Sampling is
Keys bicubic (a = -0.75, like INTER_CUBIC) with constant-zero border, then
an exact 2x2 box average (INTER_AREA 64->32) and /255.
"""

from __future__ import annotations

import functools
from typing import List

import numpy as np
import jax
import jax.numpy as jnp

from gims_tpu.core.bucketing import bucket_size
from gims_tpu.frontend.sift import KeypointArrays

WARP_SIZE = 64
OUT_SIZE = 32
FLT_EPSILON = 1.19209e-07
KP_BUCKETS = (64, 256, 1024, 4096, 8192, 16384, 32768)


def inverse_affines(kp: KeypointArrays) -> np.ndarray:
    """(N, 2, 3) mapping dst patch pixel -> source pyramid-level pixel."""
    step = kp.size * kp.scale * 0.5
    ptf = kp.pt * kp.scale[:, None]
    angle = 360.0 - kp.angle
    angle = np.where(np.abs(angle - 360.0) < FLT_EPSILON, 0.0, angle)
    phi = np.deg2rad(angle)
    s, c = np.sin(phi), np.cos(phi)
    r = (WARP_SIZE - 1) / 2.0

    # forward: A = R/step, t = r - A @ ptf;  inverse: L = step*R^T
    # src = L @ (dst - t) = L @ dst + (ptf - L @ [r, r])
    L = np.empty((len(kp), 2, 2), np.float32)
    L[:, 0, 0] = c * step
    L[:, 0, 1] = s * step
    L[:, 1, 0] = -s * step
    L[:, 1, 1] = c * step
    t = ptf - np.einsum("nij,j->ni", L, np.array([r, r], np.float32))
    return np.concatenate([L, t[:, :, None]], axis=2).astype(np.float32)


def _cubic_weights(t):
    """OpenCV INTER_CUBIC (Keys, A=-0.75) weights for offsets -1, 0, 1, 2."""
    A = -0.75
    w0 = ((A * (t + 1) - 5 * A) * (t + 1) + 8 * A) * (t + 1) - 4 * A
    w1 = ((A + 2) * t - (A + 3)) * t * t + 1
    w2 = ((A + 2) * (1 - t) - (A + 3)) * (1 - t) * (1 - t) + 1
    w3 = 1.0 - w0 - w1 - w2
    return [w0, w1, w2, w3]


def _linear_weights(t):
    return [1.0 - t, t]


# Keypoints are processed in fixed-size chunks so only one chunk's tap
# tensors are ever live — without this XLA schedules all gathers of the
# full keypoint set before the accumulation and OOMs. Each gathered tap
# (chunk, npix, 3) is tile-padded 3 -> 128 lanes in HBM, so the chunk is
# sized to keep a padded tap tensor around 0.5 GB.
WARP_CHUNK = 512


def _chunk_for(warp_size):
    return 512 if warp_size <= 32 else 256


def quad_rows_from_levels(levels):
    """(L, h, w, C) -> (L*(h+1)*(w+1), 4C) "quad" rows.

    Row (l, qy, qx) holds the 2x2 pixel neighborhood starting at original
    coordinates (qy-1, qx-1), zero-padded outside the image, tap order
    (dy, dx) = (0,0), (0,1), (1,0), (1,1) x channels. One row-gather then
    fetches an entire bilinear tap neighborhood: the TPU gather unit is
    row-count-bound (~45M rows/s) regardless of row width, so this is 4x
    fewer gather rows than per-tap fetches. The zero ring reproduces
    cv2.warpAffine's BORDER_CONSTANT zero border exactly.
    """
    lnum, h, w, c = levels.shape
    return quad_blocks_from_levels(levels).reshape(
        lnum * (h + 1) * (w + 1), 4 * c)


def quad_blocks_from_levels(levels):
    """quad_rows_from_levels without the final flatten: (L, h, w, C) ->
    (L, h+1, w+1, 4C) in native image layout. The flatten to (N, 4C) is a
    pure retiling copy on TPU (~23 ms/batch at the 2x-upsampled octave,
    scripts/profile_devsift_extract3.py); consumers that can gather by
    3-D index (sift_descriptor._descr_chunk's 4-D path) should take this
    form instead."""
    lnum, h, w, c = levels.shape
    p = jnp.pad(levels, ((0, 0), (1, 1), (1, 1), (0, 0)))
    return jnp.concatenate(
        [
            p[:, 0 : h + 1, 0 : w + 1],
            p[:, 0 : h + 1, 1 : w + 2],
            p[:, 1 : h + 2, 0 : w + 1],
            p[:, 1 : h + 2, 1 : w + 2],
        ],
        axis=-1,
    )


def _warp_chunk(quad_rows, h, w, channels, level_idx, ainv, interpolation,
                warp_size=WARP_SIZE):
    """One chunk: level_idx (k,), ainv (k, 2, 3) -> (k, out*out*C) flat.

    TPU layout note: all large intermediates are (k, warp_size^2) — the
    lane dim is a multiple of 128, so nothing is tile-padded. Taps come
    from quad rows (see quad_rows_from_levels): one gather per 2x2 tap
    block — 1 row/pixel for linear, 4 rows/pixel for cubic (4x4 taps).
    """
    k = level_idx.shape[0]
    npix = warp_size * warp_size
    xs = jnp.arange(warp_size, dtype=jnp.float32)
    if warp_size != WARP_SIZE:
        # direct low-res sampling: place the small grid at the area-average
        # centers of the full-size grid (x64 = 2*x32 + 0.5 for 32 vs 64)
        ratio = WARP_SIZE / warp_size
        xs = xs * ratio + (ratio - 1.0) / 2.0
    gx = jnp.tile(xs, warp_size)                      # (npix,) x-fast
    gy = jnp.repeat(xs, warp_size)                    # (npix,)

    sx = (
        ainv[:, 0, 0, None] * gx[None, :]
        + ainv[:, 0, 1, None] * gy[None, :]
        + ainv[:, 0, 2, None]
    )  # (k, 4096)
    sy = (
        ainv[:, 1, 0, None] * gx[None, :]
        + ainv[:, 1, 1, None] * gy[None, :]
        + ainv[:, 1, 2, None]
    )

    fx = jnp.floor(sx)
    fy = jnp.floor(sy)
    tx = sx - fx
    ty = sy - fy
    ix = fx.astype(jnp.int32)
    iy = fy.astype(jnp.int32)

    if interpolation == "cubic":
        wx = _cubic_weights(tx)
        wy = _cubic_weights(ty)
        pair_off = (-1, 1)   # quads covering taps (-1, 0) and (1, 2)
    else:
        wx = _linear_weights(tx)
        wy = _linear_weights(ty)
        pair_off = (0,)      # one quad covers taps (0, 1)

    nquads = (h + 1) * (w + 1)
    base = level_idx[:, None] * nquads
    accs = [jnp.zeros((k, npix), jnp.float32) for _ in range(channels)]
    for a, pa in enumerate(pair_off):
        qy = iy + (pa + 1)
        y_ok = (qy >= 0) & (qy <= h)
        qyc = jnp.clip(qy, 0, h)
        for b, pb in enumerate(pair_off):
            qx = ix + (pb + 1)
            # the 1-px zero ring handles taps one step outside the image;
            # quads fully outside are masked (all four taps out of bounds)
            ok = y_ok & (qx >= 0) & (qx <= w)
            qxc = jnp.clip(qx, 0, w)
            idx = base + qyc * (w + 1) + qxc
            vals = jnp.take(quad_rows, idx, axis=0)   # (k, npix, 4C)
            okf = ok.astype(jnp.float32)
            for dy in (0, 1):
                wyv = wy[2 * a + dy]
                for dx in (0, 1):
                    wgt = wyv * wx[2 * b + dx] * okf
                    slot = (dy * 2 + dx) * channels
                    for ch in range(channels):
                        accs[ch] = accs[ch] + vals[..., slot + ch] * wgt

    outs = []
    if warp_size == 2 * OUT_SIZE:
        # INTER_AREA 64 -> 32 == exact 2x2 box average, per channel
        for ch in range(channels):
            img = accs[ch].reshape(k, OUT_SIZE, 2, OUT_SIZE, 2)
            outs.append(img.mean(axis=(2, 4)))        # (k, 32, 32)
    else:
        for ch in range(channels):
            outs.append(accs[ch].reshape(k, OUT_SIZE, OUT_SIZE))
    out = jnp.stack(outs, axis=-1)                    # (k, 32, 32, C)
    return out.reshape(k, OUT_SIZE * OUT_SIZE * channels)


@functools.partial(jax.jit, static_argnums=(3, 4))
def warp_patches_chunk(levels, level_idx, ainv, interpolation="cubic",
                       warp_size=WARP_SIZE):
    """One fixed-size chunk: level_idx/ainv have exactly WARP_CHUNK rows.
    Returns (WARP_CHUNK, 32*32*C) flat patches.

    Keeping the chunk size FIXED is essential on TPU: keypoint counts per
    octave vary per image, and shape-polymorphic kernels would recompile
    (tens of seconds through the remote-compile path) mid-stream. With
    fixed chunks there are exactly num_octaves compiled kernels, ever.

    warp_size: 64 = reference parity (warp 64x64 cubic then 2x2 box
    average); 32 = fast mode (sample the 32x32 grid directly — 4x fewer
    gather rows, the TPU gather unit is row-count-bound at ~45M rows/s).
    """
    lnum, h, w, c = levels.shape
    quads = quad_rows_from_levels(levels)
    return _warp_chunk(quads, h, w, c, level_idx, ainv, interpolation,
                       warp_size)


@functools.partial(jax.jit, static_argnums=(1, 2, 5, 6))
def warp_patches_chunk_quads(quad_rows, h, w, level_idx, ainv,
                             interpolation="cubic", warp_size=WARP_SIZE):
    """Chunk warp from PREBUILT quad rows (built once per octave, so the
    quad construction isn't redone for every chunk of a large octave)."""
    c = quad_rows.shape[1] // 4
    return _warp_chunk(quad_rows, h, w, c, level_idx, ainv, interpolation,
                       warp_size)


_quad_rows_jit = jax.jit(quad_rows_from_levels)


# ---------------------------------------------------------------------------
# Block-gather fast path (linear interpolation, direct 32x32 sampling).
#
# One gathered row holds a BLOCK x BLOCK source window; a single row then
# covers the bilinear tap blocks of an entire 2x2 GROUP of output pixels —
# 4x fewer gather rows again on top of the quad layout (256 rows per
# keypoint instead of 1024). Blocks are stride-4 aligned over the
# zero-padded image; a group is block-eligible iff its source span fits
# (span <= 10 px per axis, see block_spans) — guaranteed for SIFT
# keypoints (step = size*scale*0.5 <= ~3.6 => span <= 2*step*sqrt(2) <=
# 10.2 only at exactly 45 degrees with the maximum step; the host routes
# those rare keypoints through the quad path).
#
# DISABLED BY DEFAULT: measured on the v5e, the gather unit is
# row-count-bound only up to ~192-element rows (~50M rows/s at width
# 12/128, ~46M at 192) and becomes width-bound beyond (~11M rows/s at
# width 768 = 16x16x3 blocks, ~34 GB/s effective). 4x fewer rows at ~4.5x
# lower row rate is a wash, so the quad layout (width 12, 1 row per
# output pixel) is the optimal gather shape for this warp; going below
# 1 row/pixel needs a Pallas windowed-DMA kernel or a dense conv
# frontend, not a wider gather. The path stays for parity-tested
# experimentation (flip BLOCK_PATH_ENABLED).
# ---------------------------------------------------------------------------

BLOCK = 16
BLOCK_STRIDE = 4
BLOCK_CHUNK = 256
BLOCK_SPAN_LIMIT = 10.0
BLOCK_PATH_ENABLED = False


def block_spans(ainv: np.ndarray, ratio: float = 2.0) -> np.ndarray:
    """(N, 2) worst-case source span (sx, sy) of a 2x2 output-pixel group.

    Adjacent output pixels are `ratio` apart in warp-64 grid coords, so the
    span per source axis is ratio * (|a_0| + |a_1|) of that axis' row."""
    a = np.abs(ainv[:, :, :2]).sum(axis=2) * ratio
    return a  # (N, 2): row 0 = sx span, row 1 = sy span


def block_rows_from_levels(levels):
    """(L, h, w, C) -> ((L*nby*nbx, C*BLOCK*BLOCK) rows, nby, nbx).

    Row (l, by, bx) is the zero-padded window covering ORIGINAL rows
    [4by-1, 4by+14] x cols [4bx-1, 4bx+14] (1-px zero ring + zero tail
    padding reproduce cv2's constant-zero border for every tap that lands
    inside the window). Feature order is (C, 16, 16), the layout
    lax.conv_general_dilated_patches produces.
    """
    lnum, h, w, c = levels.shape
    hp = ((h + 2 + 3) // 4) * 4 + BLOCK
    wp = ((w + 2 + 3) // 4) * 4 + BLOCK
    p = jnp.pad(levels, ((0, 0), (1, hp - h - 1), (1, wp - w - 1), (0, 0)))
    rows = jax.lax.conv_general_dilated_patches(
        p, filter_shape=(BLOCK, BLOCK),
        window_strides=(BLOCK_STRIDE, BLOCK_STRIDE),
        padding="VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    nby, nbx = rows.shape[1], rows.shape[2]
    return rows.reshape(lnum * nby * nbx, c * BLOCK * BLOCK)


def block_grid(h: int, w: int):
    """Host-side (nby, nbx) for block_rows_from_levels of an (h, w) level."""
    hp = ((h + 2 + 3) // 4) * 4 + BLOCK
    wp = ((w + 2 + 3) // 4) * 4 + BLOCK
    s = BLOCK_STRIDE
    return (hp - BLOCK) // s + 1, (wp - BLOCK) // s + 1


def _warp_chunk_block(block_rows, nby, nbx, h, w, channels, level_idx, ainv,
                      warp_size):
    """Block-path chunk: (k,) level_idx + (k, 2, 3) ainv ->
    (k, warp_size^2 * C) flat patches. Linear taps only."""
    k = level_idx.shape[0]
    g1 = warp_size // 2
    ngroups = g1 * g1
    xs = jnp.arange(warp_size, dtype=jnp.float32)
    ratio = WARP_SIZE / warp_size
    if warp_size != WARP_SIZE:
        xs = xs * ratio + (ratio - 1.0) / 2.0
    gx = jnp.tile(xs, warp_size)
    gy = jnp.repeat(xs, warp_size)
    sx = (ainv[:, 0, 0, None] * gx[None, :]
          + ainv[:, 0, 1, None] * gy[None, :] + ainv[:, 0, 2, None])
    sy = (ainv[:, 1, 0, None] * gx[None, :]
          + ainv[:, 1, 1, None] * gy[None, :] + ainv[:, 1, 2, None])

    def to_groups(a):
        a = a.reshape(k, g1, 2, g1, 2)
        return a.transpose(0, 1, 3, 2, 4).reshape(k, ngroups, 4)

    sxg, syg = to_groups(sx), to_groups(sy)
    fx = jnp.floor(sxg)
    fy = jnp.floor(syg)
    tx = sxg - fx
    ty = syg - fy
    ix = fx.astype(jnp.int32)
    iy = fy.astype(jnp.int32)

    miny = jnp.min(jnp.clip(iy, -1, h - 1), axis=-1)   # (k, g)
    minx = jnp.min(jnp.clip(ix, -1, w - 1), axis=-1)
    by = (miny + 1) // BLOCK_STRIDE
    bx = (minx + 1) // BLOCK_STRIDE
    idx = level_idx[:, None] * (nby * nbx) + by * nbx + bx
    vals = jnp.take(block_rows, idx, axis=0)           # (k, g, C*256)
    blocks = vals.reshape(k, ngroups, channels, BLOCK, BLOCK)

    ly = iy + 1 - (by * BLOCK_STRIDE)[..., None]       # (k, g, 4)
    lx = ix + 1 - (bx * BLOCK_STRIDE)[..., None]
    span = jnp.arange(BLOCK, dtype=jnp.int32)

    def onehot_weights(l, t):
        # W[..., y] = (1-t)*[y==l] + t*[y==l+1]; taps outside the window
        # get zero weight (the window's zero padding covers the border)
        l_ = l[..., None]
        e0 = (span == l_).astype(jnp.float32)
        e1 = (span == l_ + 1).astype(jnp.float32)
        return e0 * (1.0 - t)[..., None] + e1 * t[..., None]

    Wy = onehot_weights(ly, ty)                        # (k, g, 4, 16)
    Wx = onehot_weights(lx, tx)
    tmp = jnp.einsum("kgcyx,kgpy->kgpcx", blocks, Wy)
    outp = jnp.einsum("kgpcx,kgpx->kgpc", tmp, Wx)     # (k, g, 4, C)

    out = outp.reshape(k, g1, g1, 2, 2, channels)
    out = out.transpose(0, 1, 3, 2, 4, 5)              # (k, gy, py, gx, px, C)
    return out.reshape(k, warp_size * warp_size * channels)


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4, 7))
def warp_patches_chunk_blocks(block_rows, nby, nbx, h, w, level_idx, ainv,
                              warp_size=OUT_SIZE):
    c = block_rows.shape[1] // (BLOCK * BLOCK)
    return _warp_chunk_block(block_rows, nby, nbx, h, w, c, level_idx, ainv,
                             warp_size)


_block_rows_jit = jax.jit(block_rows_from_levels)


def warp_patches_level(levels, level_idx, ainv, interpolation="cubic"):
    """levels: (L, H, W, C) f32; level_idx: (K,) i32; ainv: (K, 2, 3).

    Returns (K, 32, 32, C) f32 (0..255 range preserved; caller normalizes).
    Host loop over fixed WARP_CHUNK-sized compiled chunks.
    """
    kcount = level_idx.shape[0]
    c = levels.shape[-1]
    chunk = _chunk_for(WARP_SIZE)
    nchunks = -(-kcount // chunk)
    pad = nchunks * chunk - kcount
    li = jnp.pad(level_idx, (0, pad)).reshape(nchunks, chunk)
    av = jnp.pad(ainv, ((0, pad), (0, 0), (0, 0))).reshape(
        nchunks, chunk, 2, 3
    )
    outs = [
        warp_patches_chunk(levels, li[i], av[i], interpolation)
        for i in range(nchunks)
    ]
    out = jnp.concatenate(outs, axis=0) if len(outs) > 1 else outs[0]
    return out[:kcount].reshape(kcount, OUT_SIZE, OUT_SIZE, c)


@functools.partial(jax.jit, donate_argnums=(0,))
def _scatter_patches(out, sel, patches):
    # sel is fixed WARP_CHUNK-sized; out-of-range sentinel rows are dropped
    return out.at[sel].set(patches)


def extract_patches_device(
    pyramid,                 # sequence of (6, H_o, W_o, C) device arrays
    kp: KeypointArrays,
    out_bucket: int,
    interpolation: str = "cubic",
    warp_size: int = WARP_SIZE,
):
    """All keypoints -> DEVICE (out_bucket, 32, 32, C) f32 patches in [0,1].

    Groups keypoints by octave on the host, pads each group to a bucket,
    runs one compiled warp per (octave shape, bucket), and scatters the
    results into a device-resident output buffer — nothing round-trips to
    the host (host<->device bandwidth is the scarcest resource here).
    """
    n = len(kp)
    ch = int(pyramid[0].shape[-1]) if len(pyramid) else 3
    # flat (bucket, 32*32*C) buffer: lane dim is a multiple of 128, so the
    # scatter and all consumers are tile-aligned (a trailing C=3 would pad
    # 3 -> 128 lanes in HBM)
    out = jnp.zeros((out_bucket, OUT_SIZE * OUT_SIZE * ch), jnp.float32)
    if n == 0:
        return out
    ainv = inverse_affines(kp)
    oct_index = kp.octave + 1  # firstOctave = -1
    use_blocks = (BLOCK_PATH_ENABLED and interpolation == "linear"
                  and warp_size == OUT_SIZE)
    if use_blocks:
        spans = block_spans(ainv, ratio=WARP_SIZE / warp_size)
        block_ok = (spans <= BLOCK_SPAN_LIMIT).all(axis=1)
    for o in range(len(pyramid)):
        osel = np.nonzero(oct_index == o)[0]
        osel = osel[osel < out_bucket]
        if osel.size == 0:
            continue
        lvh, lvw = int(pyramid[o].shape[1]), int(pyramid[o].shape[2])
        groups = [(osel, False)]
        if use_blocks:
            groups = [(osel[block_ok[osel]], True),
                      (osel[~block_ok[osel]], False)]
        quads = None
        brows = None
        for sel, via_blocks in groups:
            if sel.size == 0:
                continue
            chunk = BLOCK_CHUNK if via_blocks else _chunk_for(warp_size)
            nchunks = -(-sel.size // chunk)
            kb = nchunks * chunk
            lv = np.zeros((kb,), np.int32)
            av = np.zeros((kb, 2, 3), np.float32)
            selp = np.full((kb,), out_bucket, np.int32)  # OOB rows dropped
            lv[: sel.size] = kp.layer[sel]
            av[: sel.size] = ainv[sel]
            selp[: sel.size] = sel
            if via_blocks and brows is None:
                brows = _block_rows_jit(pyramid[o])
                nby, nbx = block_grid(lvh, lvw)
            if not via_blocks and quads is None:
                quads = _quad_rows_jit(pyramid[o])
            for i in range(nchunks):
                s = slice(i * chunk, (i + 1) * chunk)
                if via_blocks:
                    patches = warp_patches_chunk_blocks(
                        brows, int(nby), int(nbx), lvh, lvw,
                        jnp.asarray(lv[s]), jnp.asarray(av[s]), warp_size,
                    )
                else:
                    patches = warp_patches_chunk_quads(
                        quads, lvh, lvw, jnp.asarray(lv[s]),
                        jnp.asarray(av[s]), interpolation, warp_size,
                    )
                out = _scatter_patches(out, jnp.asarray(selp[s]), patches)
    return out / 255.0


def extract_patches(
    pyramid,
    kp: KeypointArrays,
    interpolation: str = "cubic",
) -> np.ndarray:
    """Host-output variant of extract_patches_device (tests / tools)."""
    n = len(kp)
    ch = int(pyramid[0].shape[-1]) if len(pyramid) else 3
    if n == 0:
        return np.zeros((0, OUT_SIZE, OUT_SIZE, ch), np.float32)
    dev = extract_patches_device(
        pyramid, kp, bucket_size(n, KP_BUCKETS), interpolation
    )
    return np.asarray(dev)[:n].reshape(n, OUT_SIZE, OUT_SIZE, ch)
