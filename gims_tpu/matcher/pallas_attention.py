"""Pallas fused masked flash attention for the GNN trunk (TPU).

One kernel per (batch*head, q-block) fuses the whole online-softmax
chain — QK^T, masking, running max/denominator, PV accumulation — so the
(N, M) score matrix never leaves VMEM. This replaces the `lax.scan`
streaming path in attention.py for large buckets: the scan keeps its
running (B, H, N, D) accumulator in HBM and re-reads Q every step, while
here each Q tile is read once and the accumulator lives in VMEM scratch.

Reference hot loop being replaced: the 18-layer all-pairs attention at
N ~ 15k (reference models/gmatcher.py:35-39, 99-143; 3.48 s/pair on the
RTX 3090 per BASELINE.md).

Grid layout: (B*H, N/block_q, M/block_k); the key-block axis is innermost
so the f32 accumulator persists in scratch across key blocks and the
output tile is written exactly once, on the last key block.

Measured on the v5e (scripts/bench_attention.py, N=M=12288, H=4, D=64,
bf16): 2.20 ms/call at 1024/1024 blocks vs 2.71 ms for the lax.scan flash
path (1.24x); 512-wide blocks are MXU-underutilized (3.8 ms) and
2048x2048 overflows VMEM (the f32 score tile alone is 16 MB).

The key mask rides as a precomputed f32 additive bias row (0 / -1e9),
matching masked_attention_direct's NEG_INF semantics. Padded (invalid)
query rows produce finite garbage, exactly like the direct/flash paths —
callers mask downstream.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9
LOG2E = 1.4426950408889634  # 1/ln 2


def _attn_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref,
                 acc_ref, m_ref, l_ref, *, scale):
    j = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(j == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)

    q = q_ref[0]          # (BQ, D)
    k = k_ref[0]          # (BK, D)
    v = v_ref[0]          # (BK, D)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                      # (BQ, BK) f32
    # base-2 softmax: fold log2(e) into the scale so the (BQ, BK) tile
    # uses the VPU's native exp2 instead of exp — the tile-wide
    # exponential is this kernel's VPU bottleneck (N*M*H evaluations per
    # trunk layer). exp2((s*scale + bias)*log2e - m2) == exp(x - m), so
    # the softmax value is unchanged; only rounding differs.
    s = s * (scale * LOG2E) + bias_ref[0]  # bias (1, 1, BK) -> (1, BK)

    m_prev = m_ref[:, :1]                       # (BQ, 1) base-2 domain
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    corr = jnp.exp2(m_prev - m_new)             # (BQ, 1)
    p = jnp.exp2(s - m_new)                     # (BQ, BK)
    l_ref[:, :1] = l_ref[:, :1] * corr + jnp.sum(p, axis=-1, keepdims=True)
    m_ref[:, :1] = m_new

    pv = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                           # (BQ, D)
    acc_ref[...] = acc_ref[...] * corr + pv

    @pl.when(j == nk - 1)
    def _flush():
        denom = jnp.maximum(l_ref[:, :1], 1e-30)
        o_ref[0] = (acc_ref[...] / denom).astype(o_ref.dtype)


def _pad_axis(x, axis, to, fill=0.0):
    pad = to - x.shape[axis]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=fill)


@functools.partial(
    jax.jit, static_argnames=("block_q", "block_k", "interpret")
)
def masked_attention_pallas(q, k, v, key_mask, block_q: int = 1024,
                            block_k: int = 1024, interpret: bool = False):
    """q: (B, N, H, D); k, v: (B, M, H, D); key_mask: (B, M) bool.

    Returns (B, N, H, D) in q.dtype — same contract as
    masked_attention_direct / masked_attention_flash.
    """
    b, n, h, d = q.shape
    m = k.shape[1]
    block_q = min(block_q, max(n, 8))
    block_k = min(block_k, max(m, 128))
    nq = pl.cdiv(n, block_q)
    nk = pl.cdiv(m, block_k)
    n_pad, m_pad = nq * block_q, nk * block_k

    # (B, N, H, D) -> (B*H, N, D): head-major rows, one grid row per (b, h)
    qt = q.transpose(0, 2, 1, 3).reshape(b * h, n, d)
    kt = k.transpose(0, 2, 1, 3).reshape(b * h, m, d)
    vt = v.transpose(0, 2, 1, 3).reshape(b * h, m, d)
    qt = _pad_axis(qt, 1, n_pad)
    kt = _pad_axis(kt, 1, m_pad)
    vt = _pad_axis(vt, 1, m_pad)
    # additive bias in the base-2 logit domain (see _attn_kernel): 0 for
    # valid keys, NEG_INF for masked — NEG_INF needs no log2e rescale,
    # it saturates either way
    bias = jnp.where(key_mask, 0.0, NEG_INF).astype(jnp.float32)
    bias = _pad_axis(bias, 1, m_pad, fill=NEG_INF)  # padded keys masked out
    # (B, 1, M): TPU block tiling constrains the LAST TWO dims of every
    # block — a (1, block_k) block over (B, M) is only legal when B == 1
    # (the sublane dim must divide 8 or equal the array dim). Carrying the
    # bias as (B, 1, M) makes the block (1, 1, block_k), whose last-two
    # dims (1, block_k) match the array's (1, M) tiling for every B.
    bias = bias[:, None, :]

    scale = 1.0 / (float(d) ** 0.5)
    grid = (b * h, nq, nk)

    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda bh, i, j: (bh, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda bh, i, j: (bh, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda bh, i, j: (bh, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_k), lambda bh, i, j: (bh // h, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda bh, i, j: (bh, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, n_pad, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, d), jnp.float32),    # acc
            pltpu.VMEM((block_q, 128), jnp.float32),  # running max (col 0)
            pltpu.VMEM((block_q, 128), jnp.float32),  # running sum (col 0)
        ],
        interpret=interpret,
    )(qt, kt, vt, bias)

    out = out[:, :n].reshape(b, h, n, d).transpose(0, 2, 1, 3)
    return out
