"""Pallas TPU kernel for the log-Sinkhorn iterations.

The XLA path (sinkhorn.py) reads the (M+1)x(N+1) coupling matrix four
times per iteration (max + exp-sum per axis). This kernel streams Z
through VMEM in row blocks with ONLINE logsumexp (flash-style running
max/sum), touching Z twice per iteration, with u and v resident in VMEM
across all iterations — the matrix never round-trips through XLA temps.

Math parity with sinkhorn.log_sinkhorn_iterations; the wrapper
log_optimal_transport_pallas matches sinkhorn.log_optimal_transport and
falls back to the XLA path off-TPU (interpret mode is used in tests).

KNOWN FAULT (round 5, unresolved): inside the big batched upsampled
devsift fused program, this kernel crashes the TPU worker for specific
pair compositions (reproducer: bench.make_images(20) pair 11 x4 at
batch=4, N1=6272) — deterministic per composition, data-dependent, yet
every DMA offset here is grid/loop-derived and the SAME inputs pass
when extract/matcher run as separate programs, or single-pair, or with
the XLA sinkhorn. Smells like an XLA<->Mosaic composition issue (buffer
placement/DMA interaction under that program's memory pressure), not
kernel math. Until root-caused, the devsift bench/eval configs pass
use_pallas_sinkhorn=False; the dense_gray bench default (compact 4096,
batch 8) has never shown it across hundreds of batches.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gims_tpu.matcher.sinkhorn import NEG_INF

ROW_BLOCK = 128


def _sinkhorn_kernel(Z_ref, log_mu_ref, log_nu_ref, u_ref, v_ref,
                     *, iters: int, m1: int, n1: int):
    """Z: (B, M1, N1) in HBM-ish (ANY), full array — the grid runs over
    the batch axis and each step DMAs its own pair's row blocks (a
    Squeezed batch BlockSpec on an ANY-space operand is not lowerable, so
    batching must happen inside the kernel). log_mu/log_nu/u/v are
    (1, M1)/(1, N1) per-batch VMEM blocks.

    Row update computes u = log_mu - lse_cols(Z + v); col update
    v = log_nu - lse_rows(Z + u), both streamed over row blocks of Z with
    online accumulation for the column reduction.
    """
    nblocks = m1 // ROW_BLOCK  # m1 padded to a multiple of ROW_BLOCK
    pid = pl.program_id(0)

    def body(scratch, mx_ref, s_ref, sems):
        u_ref[:] = jnp.zeros_like(u_ref)
        v_ref[:] = jnp.zeros_like(v_ref)

        def start_dma(slot, b):
            return pltpu.make_async_copy(
                Z_ref.at[pid, pl.ds(b * ROW_BLOCK, ROW_BLOCK), :],
                scratch.at[slot], sems.at[slot],
            )

        def one_iter(it, _):
            # ---- row update: u = log_mu - lse over columns ----
            start_dma(0, 0).start()

            def row_block(b, _):
                slot = jax.lax.rem(b, 2)
                nxt = jax.lax.rem(b + 1, 2)

                @pl.when(b + 1 < nblocks)
                def _():
                    start_dma(nxt, b + 1).start()

                start_dma(slot, b).wait()
                zb = scratch[slot] + v_ref[0, 0, :][None, :]
                mx = jnp.max(zb, axis=1)
                mx = jnp.maximum(mx, NEG_INF)
                s = jnp.sum(jnp.exp(zb - mx[:, None]), axis=1)
                lse = mx + jnp.log(jnp.maximum(s, 1e-38))
                u_ref[0, 0, pl.ds(b * ROW_BLOCK, ROW_BLOCK)] = (
                    log_mu_ref[0, 0, pl.ds(b * ROW_BLOCK, ROW_BLOCK)]
                    - jnp.maximum(lse, NEG_INF)
                )
                return 0

            jax.lax.fori_loop(0, nblocks, row_block, 0)

            # ---- col update: v = log_nu - lse over rows (online) ----
            mx_ref[:] = jnp.full_like(mx_ref, NEG_INF)
            s_ref[:] = jnp.zeros_like(s_ref)
            start_dma(0, 0).start()

            def col_block(b, _):
                slot = jax.lax.rem(b, 2)
                nxt = jax.lax.rem(b + 1, 2)

                @pl.when(b + 1 < nblocks)
                def _():
                    start_dma(nxt, b + 1).start()

                start_dma(slot, b).wait()
                zb = (
                    scratch[slot]
                    + u_ref[0, 0, pl.ds(b * ROW_BLOCK, ROW_BLOCK)][:, None]
                )
                blk_mx = jnp.max(zb, axis=0)
                new_mx = jnp.maximum(mx_ref[0, :], blk_mx)
                new_mx = jnp.maximum(new_mx, NEG_INF)
                corr = jnp.exp(mx_ref[0, :] - new_mx)
                add = jnp.sum(jnp.exp(zb - new_mx[None, :]), axis=0)
                s_ref[0, :] = s_ref[0, :] * corr + add
                mx_ref[0, :] = new_mx
                return 0

            jax.lax.fori_loop(0, nblocks, col_block, 0)
            lse = mx_ref[0, :] + jnp.log(jnp.maximum(s_ref[0, :], 1e-38))
            v_ref[0, 0, :] = log_nu_ref[0, 0, :] - jnp.maximum(lse, NEG_INF)
            return 0

        jax.lax.fori_loop(0, iters, one_iter, 0)

    pl.run_scoped(
        body,
        scratch=pltpu.VMEM((2, ROW_BLOCK, n1), jnp.float32),
        mx_ref=pltpu.VMEM((1, n1), jnp.float32),
        s_ref=pltpu.VMEM((1, n1), jnp.float32),
        sems=pltpu.SemaphoreType.DMA((2,)),
    )


def sinkhorn_uv_pallas(Z, log_mu, log_nu, iters: int, interpret=False):
    """Compute (u, v) potentials for a batch of coupling matrices.

    Z: (B, M1, N1); log_mu: (B, M1); log_nu: (B, N1). The batch axis is
    the kernel grid — each grid step streams its own pair, so the whole
    batched fused program stays ONE pallas_call (a vmap over the call
    would put a Squeezed batch dim on the ANY-space operand, which the
    TPU lowering rejects)."""
    bsz, m1, n1 = Z.shape
    pad_m = (-m1) % ROW_BLOCK
    pad_n = (-n1) % 128  # Mosaic requires lane-aligned HBM slices
    if pad_m or pad_n:
        Z = jnp.pad(Z, ((0, 0), (0, pad_m), (0, pad_n)),
                    constant_values=NEG_INF)
        log_mu = jnp.pad(log_mu, ((0, 0), (0, pad_m)),
                         constant_values=NEG_INF)
        log_nu = jnp.pad(log_nu, ((0, 0), (0, pad_n)),
                         constant_values=NEG_INF)
    m1p, n1p = m1 + pad_m, n1 + pad_n
    kernel = functools.partial(
        _sinkhorn_kernel, iters=iters, m1=m1p, n1=n1p
    )
    # Vectors ride as (B, 1, len) so each grid step's VMEM block is
    # (1, 1, len): the TPU lowering requires the block's last two dims to
    # be (8, 128)-aligned OR equal to the array's — (1, len) equals the
    # array's trailing dims, whereas a (1, len) block of a (B, len) array
    # does not when B > 1.
    u, v = pl.pallas_call(
        kernel,
        grid=(bsz,),
        out_shape=(
            jax.ShapeDtypeStruct((bsz, 1, m1p), jnp.float32),
            jax.ShapeDtypeStruct((bsz, 1, n1p), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 1, m1p), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n1p), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, m1p), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n1p), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(Z, log_mu[:, None, :], log_nu[:, None, :])
    return u[:, 0, :m1], v[:, 0, :n1]


def log_optimal_transport_pallas(scores, alpha, iters, row_mask, col_mask,
                                 interpret=False):
    """Drop-in for sinkhorn.log_optimal_transport using the Pallas kernel.

    Returns the same (B, M+1, N+1) log-coupling.
    """
    b, m, n = scores.shape
    ms = jnp.sum(row_mask, axis=1).astype(scores.dtype)
    ns = jnp.sum(col_mask, axis=1).astype(scores.dtype)

    pair_ok = row_mask[:, :, None] & col_mask[:, None, :]
    scores = jnp.where(pair_ok, scores, NEG_INF)
    bins0 = jnp.where(row_mask, alpha, NEG_INF)[:, :, None]
    bins1 = jnp.where(col_mask, alpha, NEG_INF)[:, None, :]
    corner = jnp.full((b, 1, 1), alpha, scores.dtype)
    couplings = jnp.concatenate(
        [
            jnp.concatenate([scores, bins0], axis=2),
            jnp.concatenate([bins1, corner], axis=2),
        ],
        axis=1,
    )

    norm = -jnp.log(ms + ns)
    log_mu = jnp.concatenate(
        [
            jnp.where(row_mask, norm[:, None], NEG_INF),
            (jnp.log(jnp.maximum(ns, 1e-38)) + norm)[:, None],
        ],
        axis=1,
    )
    log_nu = jnp.concatenate(
        [
            jnp.where(col_mask, norm[:, None], NEG_INF),
            (jnp.log(jnp.maximum(ms, 1e-38)) + norm)[:, None],
        ],
        axis=1,
    )

    u, v = sinkhorn_uv_pallas(couplings, log_mu, log_nu, iters,
                              interpret=interpret)
    Z = couplings + u[:, :, None] + v[:, None, :]
    return Z - norm[:, None, None]
