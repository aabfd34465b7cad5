"""Masked multi-head attention for the GNN trunk.

Two interchangeable paths:

* `masked_attention_direct`: materializes (B, H, N, M) scores — used for
  small buckets and as the reference/tests implementation.
* `masked_attention_flash`: blockwise streaming softmax over key chunks
  (`jax.lax.scan`) so the N x M score matrix never exists in full. At the
  reference's eval scale (N ~ 15k) the direct path would need ~4 GB per
  call per layer (SURVEY.md §5 long-context row); the flash path is
  O(N * block).
* `masked_attention_pallas` (gims_tpu/matcher/pallas_attention.py): the
  fused VMEM-resident kernel — the default above FLASH_THRESHOLD keys on
  TPU backends; flash is the non-TPU fallback.

Math parity: reference models/gmatcher.py:35-39 — scores scaled by
1/sqrt(head_dim), softmax over keys.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

NEG_INF = -1e9
FLASH_THRESHOLD = 4096
FLASH_BLOCK = 1024


def masked_attention_direct(q, k, v, key_mask, precision=None):
    """q: (B, N, H, D); k, v: (B, M, H, D); key_mask: (B, M) bool."""
    d = q.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.float32(d)).astype(q.dtype)
    scores = jnp.einsum("bnhd,bmhd->bhnm", q, k, precision=precision) * scale
    scores = jnp.where(key_mask[:, None, None, :], scores, NEG_INF)
    prob = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhnm,bmhd->bnhd", prob, v, precision=precision)


def masked_attention_flash(q, k, v, key_mask, block_size=FLASH_BLOCK,
                           precision=None):
    """Streaming-softmax attention over key blocks (flash-style).

    Equivalent to the direct path up to float rounding; never materializes
    more than (B, H, N, block_size) scores at once. Operands are
    pre-transposed to (B, H, N, D) once so the per-block dot_generals have
    leading batch dims (b, h) and a minor-most contraction — the layout
    the MXU wants — instead of transposing inside every scan step.
    """
    b, n, h, d = q.shape
    m = k.shape[1]
    scale = 1.0 / jnp.sqrt(jnp.float32(d))

    nblocks = -(-m // block_size)
    pad = nblocks * block_size - m
    if pad:
        k = jnp.pad(k, ((0, 0), (0, pad), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad), (0, 0), (0, 0)))
        key_mask = jnp.pad(key_mask, ((0, 0), (0, pad)))

    qt = q.transpose(0, 2, 1, 3)                      # (B, H, N, D)
    kb = (
        k.reshape(b, nblocks, block_size, h, d)
        .transpose(1, 0, 3, 2, 4)                     # (blk, B, H, C, D)
    )
    vb = (
        v.reshape(b, nblocks, block_size, h, d)
        .transpose(1, 0, 3, 2, 4)
    )
    mb = key_mask.reshape(b, nblocks, block_size).transpose(1, 0, 2)

    acc0 = jnp.zeros((b, h, n, d), jnp.float32)
    l0 = jnp.zeros((b, h, n), jnp.float32)
    m0 = jnp.full((b, h, n), NEG_INF, jnp.float32)

    def step(carry, blk):
        acc, l, mx = carry
        kc, vc, mc = blk
        s = jnp.einsum("bhnd,bhcd->bhnc", qt, kc, precision=precision)
        s = s.astype(jnp.float32) * scale
        s = jnp.where(mc[:, None, None, :], s, NEG_INF)
        mx_new = jnp.maximum(mx, jnp.max(s, axis=-1))
        corr = jnp.exp(mx - mx_new)
        p = jnp.exp(s - mx_new[..., None])
        l = l * corr + jnp.sum(p, axis=-1)
        acc = acc * corr[..., None] + jnp.einsum(
            "bhnc,bhcd->bhnd", p.astype(q.dtype), vc, precision=precision
        ).astype(jnp.float32)
        return (acc, l, mx_new), None

    (acc, l, _), _ = jax.lax.scan(step, (acc0, l0, m0), (kb, vb, mb))
    out = acc / jnp.maximum(l, 1e-30)[..., None]
    return out.transpose(0, 2, 1, 3).astype(q.dtype)  # back to (B, N, H, D)


def masked_attention(q, k, v, key_mask, precision=None, impl: str = "auto"):
    """Dispatch by static key count and backend.

    impl: "auto" (pallas on TPU above FLASH_THRESHOLD, else direct/flash),
    or force "direct" / "flash" / "pallas" / "pallas_interpret".
    """
    if impl == "ring":
        from gims_tpu.matcher.ring_attention import (
            get_ring_mesh,
            masked_attention_ring,
        )

        mesh, axis = get_ring_mesh()
        return masked_attention_ring(q, k, v, key_mask, mesh=mesh,
                                     axis_name=axis)
    if impl in ("pallas", "pallas_interpret"):
        from gims_tpu.matcher.pallas_attention import masked_attention_pallas

        return masked_attention_pallas(
            q, k, v, key_mask, interpret=(impl == "pallas_interpret")
        )
    if impl == "direct" or (
        impl == "auto" and k.shape[1] <= FLASH_THRESHOLD
    ):
        return masked_attention_direct(q, k, v, key_mask, precision=precision)
    if impl == "auto" and jax.default_backend() == "tpu":
        from gims_tpu.matcher.pallas_attention import masked_attention_pallas

        return masked_attention_pallas(q, k, v, key_mask)
    return masked_attention_flash(q, k, v, key_mask, precision=precision)
