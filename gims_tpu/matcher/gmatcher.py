"""GMatcher — the graph-attentional matcher trunk (flax).

Composition parity with reference models/gmatcher.py:165-307:
GraphSAGE(graph feats) + KeypointEncoder(normalized xy) -> 18-layer
self/cross AttentionalGNN -> final 1x1 projection -> scaled inner-product
scores -> log-domain Sinkhorn with dustbins -> mutual-max extraction.

Shapes here are padded and masked; the AGC "kept" mask plays the role of
the reference's physical node removal.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from gims_tpu.config import MatcherConfig
from gims_tpu.matcher.layers import (
    AttentionalGNN,
    GraphSAGE,
    KeypointEncoder,
)
from gims_tpu.matcher import sinkhorn


def normalize_keypoints(kpts, height: int, width: int, mode: str = "standard"):
    """Center+scale keypoints to ~[-0.7, 0.7].

    mode="standard": center (W/2, H/2), scale 0.7*max(H, W) — the intended
    math of reference models/gmatcher.py:26-33.

    mode="gims": bit-compatible with the reference *as executed*: its NHWC
    image batch (B, H, W, 3) is unpacked as (_, _, height, width), so
    "height"=W and "width"=3 — i.e. center (1.5, W/2) and scale 0.7*W on
    both axes. Required when importing reference-trained checkpoints.
    """
    kpts = jnp.asarray(kpts, jnp.float32)
    if mode == "gims":
        h_eff, w_eff = float(width), 3.0
    else:
        h_eff, w_eff = float(height), float(width)
    size = jnp.array([w_eff, h_eff], jnp.float32)
    center = size / 2.0
    scaling = jnp.max(size) * 0.7
    return (kpts - center) / scaling


class GMatcher(nn.Module):
    """Inputs are per-pair padded tensors; returns log-couplings and the
    projected descriptors. Extraction/loss live in pipeline.py."""

    config: MatcherConfig

    @nn.compact
    def __call__(self, kpts0n, desc0, adj0, kept0,
                 kpts1n, desc1, adj1, kept1, train: bool = False):
        cfg = self.config
        layer_names = ["self", "cross"] * (cfg.num_gnn_layers // 2)

        sage = GraphSAGE(
            cfg.descriptor_dim, cfg.descriptor_dim // 2, cfg.descriptor_dim,
            cfg.sage_layers, name="gnn_encoder",
        )
        kenc = KeypointEncoder(
            cfg.descriptor_dim, cfg.keypoint_encoder, cfg.use_layernorm,
            name="kenc",
        )
        attn_dtype = (
            jnp.bfloat16 if cfg.attention_dtype == "bfloat16" else jnp.float32
        )
        gnn = AttentionalGNN(
            cfg.descriptor_dim, layer_names, cfg.num_heads,
            cfg.use_layernorm, dtype=attn_dtype,
            attn_impl=cfg.attention_impl, remat=cfg.remat,
            stack_sides=cfg.stack_sides, name="gnn",
        )
        # Inference: run both sides through every pre/post-trunk stage as
        # ONE stacked batch of 2B (see MatcherConfig.stack_sides).
        stack = (cfg.stack_sides and not train
                 and desc0.shape == desc1.shape
                 and kpts0n.shape == kpts1n.shape)

        # Zero out pruned/padded tokens before anything runs: pad slots
        # carry sentinel keypoints (1e6) whose kenc/MLP activations grow
        # without bound across the 18 residual layers and leak NaN into
        # valid rows through 0 * inf in the attention p @ v product (bf16
        # trunks die first, but f32 is only a few layers behind). Masked
        # tokens are excluded from attention keys / SAGE edges / stats /
        # extraction everywhere, so zeroing them is semantics-free.
        kpts0n = jnp.where(kept0[..., None], kpts0n, 0.0)
        kpts1n = jnp.where(kept1[..., None], kpts1n, 0.0)
        desc0 = jnp.where(kept0[..., None], desc0, 0.0)
        desc1 = jnp.where(kept1[..., None], desc1, 0.0)

        final = nn.Dense(cfg.descriptor_dim, name="final_proj")
        if stack:
            bsz = desc0.shape[0]
            desc = jnp.concatenate([desc0, desc1], axis=0)
            adj = jnp.concatenate([adj0, adj1], axis=0)
            kept = jnp.concatenate([kept0, kept1], axis=0)
            kpts = jnp.concatenate([kpts0n, kpts1n], axis=0)
            if cfg.input_dim != cfg.descriptor_dim:
                desc = nn.Dense(cfg.descriptor_dim, name="input_proj")(desc)
            d = sage(desc, adj, kept) + kenc(kpts, kept, train)
            d0, d1 = gnn(d[:bsz].astype(attn_dtype),
                         d[bsz:].astype(attn_dtype), kept0, kept1, train)
            md = final(jnp.concatenate([d0, d1], axis=0).astype(jnp.float32))
            mdesc0, mdesc1 = md[:bsz], md[bsz:]
        else:
            if cfg.input_dim != cfg.descriptor_dim:
                proj = nn.Dense(cfg.descriptor_dim, name="input_proj")
                desc0 = proj(desc0)
                desc1 = proj(desc1)

            # GraphSAGE over each graph (batched dense aggregation)
            h0 = sage(desc0, adj0, kept0)
            h1 = sage(desc1, adj1, kept1)

            d0 = h0 + kenc(kpts0n, kept0, train)
            d1 = h1 + kenc(kpts1n, kept1, train)

            d0 = d0.astype(attn_dtype)
            d1 = d1.astype(attn_dtype)
            d0, d1 = gnn(d0, d1, kept0, kept1, train)
            mdesc0 = final(d0.astype(jnp.float32))
            mdesc1 = final(d1.astype(jnp.float32))

        scores = jnp.einsum(
            "bnc,bmc->bnm", mdesc0, mdesc1,
            precision=jax.lax.Precision.HIGHEST,
        ) / jnp.sqrt(jnp.float32(cfg.descriptor_dim))

        bin_score = self.param(
            "bin_score", lambda *_: jnp.asarray(1.0, jnp.float32)
        )
        if cfg.use_pallas_sinkhorn:
            from gims_tpu.matcher.pallas_sinkhorn import (
                log_optimal_transport_pallas,
            )

            # off-TPU the Mosaic kernel can't lower: run it in interpret
            # mode so the TPU knob combination stays testable on the CPU
            # suite (ADVICE r3: the shipped TPU default must be covered
            # by CPU parity tests, not only by TPU runs)
            Z = log_optimal_transport_pallas(
                scores, bin_score, cfg.sinkhorn_iterations, kept0, kept1,
                interpret=jax.default_backend() != "tpu",
            )
        else:
            Z = sinkhorn.log_optimal_transport(
                scores, bin_score, cfg.sinkhorn_iterations, kept0, kept1
            )
        return {"Z": Z, "mdesc0": mdesc0, "mdesc1": mdesc1, "scores": scores}
