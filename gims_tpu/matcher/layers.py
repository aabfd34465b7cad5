"""Flax building blocks for the GMatcher trunk.

Data layout is tokens-last-channel: (B, N, C) — the TPU-friendly layout —
whereas the reference uses torch Conv1d's (B, C, N). A 1x1 Conv1d is a
per-token Dense, so each reference conv maps to `nn.Dense` here.

All normalization layers are mask-aware: padded tokens contribute nothing
to batch statistics, so train-time behavior matches the reference's
unpadded tensors exactly.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from gims_tpu.matcher.attention import masked_attention


class MaskedBatchNorm(nn.Module):
    """BatchNorm1d over (batch, tokens) with a validity mask.

    Parity with torch.nn.BatchNorm1d: biased variance for normalization,
    unbiased variance in the running buffer, momentum 0.1, eps 1e-5.
    """

    features: int
    momentum: float = 0.1
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, mask, train: bool):
        # x: (B, N, C); mask: (B, N)
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        ra_mean = self.variable(
            "batch_stats", "mean", nn.initializers.zeros, None, (self.features,)
        )
        ra_var = self.variable(
            "batch_stats", "var", nn.initializers.ones, None, (self.features,)
        )
        if train:
            w = mask[..., None].astype(x.dtype)
            cnt = jnp.maximum(jnp.sum(w), 1.0)
            mean = jnp.sum(x * w, axis=(0, 1)) / cnt
            var = jnp.sum(jnp.square(x - mean) * w, axis=(0, 1)) / cnt
            if not self.is_initializing():
                unbiased = var * cnt / jnp.maximum(cnt - 1.0, 1.0)
                ra_mean.value = (
                    (1 - self.momentum) * ra_mean.value + self.momentum * mean
                )
                ra_var.value = (
                    (1 - self.momentum) * ra_var.value + self.momentum * unbiased
                )
        else:
            mean, var = ra_mean.value, ra_var.value
        y = (x - mean) * jax.lax.rsqrt(var + self.eps)
        return y * scale + bias


class ChannelLayerNorm(nn.Module):
    """The reference's custom LayerNorm (reference: models/gmatcher.py:74-85):
    normalizes over the *token* axis per channel (mean/std over dim=-2 of
    (B, C, N), i.e. over channels ... note the reference normalizes over the
    channel axis of its (B, C, N) layout, with std (unbiased, +eps on std not
    var). Here x is (B, N, C) so the reduction is over C."""

    features: int
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x, mask=None, train: bool = False):
        a = self.param("a_2", nn.initializers.ones, (self.features,))
        b = self.param("b_2", nn.initializers.zeros, (self.features,))
        mean = jnp.mean(x, axis=-1, keepdims=True)
        # unbiased std to match torch.Tensor.std default
        n = x.shape[-1]
        var = jnp.sum(jnp.square(x - mean), axis=-1, keepdims=True) / max(n - 1, 1)
        # +1e-20 inside the sqrt: d/dx sqrt(0) is inf, and zeroed padding
        # tokens hit var == 0 exactly — one such token NaN-poisons every
        # parameter gradient. Numerically invisible (sqrt(1e-20) = 1e-10
        # vs eps = 1e-6 in the denominator); torch parity unaffected.
        std = jnp.sqrt(var + 1e-20)
        return a * ((x - mean) / (std + self.eps)) + b


class MLP1d(nn.Module):
    """Per-token MLP: [Dense -> Norm -> ReLU]* -> Dense.

    Mirrors the reference MLP() factory (reference: models/gmatcher.py:11-24):
    normalization + ReLU between all layers except after the last.

    `dtype` selects the matmul compute dtype (bf16 runs the MXU at full
    rate); normalization statistics always run in f32.
    """

    channels: Sequence[int]
    use_layernorm: bool = False
    do_bn: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask, train: bool):
        n = len(self.channels)
        for i, ch in enumerate(self.channels):
            x = nn.Dense(ch, use_bias=True, dtype=self.dtype,
                         name=f"dense_{i}")(x)
            if i < n - 1:
                xf = x.astype(jnp.float32)
                if self.use_layernorm:
                    xf = ChannelLayerNorm(ch, name=f"norm_{i}")(xf, mask, train)
                elif self.do_bn:
                    xf = MaskedBatchNorm(ch, name=f"norm_{i}")(xf, mask, train)
                x = nn.relu(xf).astype(self.dtype)
        return x


class KeypointEncoder(nn.Module):
    """MLP over normalized keypoint xy -> feature_dim positional code.

    Reference: models/gmatcher.py:87-97 with score=False (scores are NOT
    encoded — reference gmatcher.py:181-185 passes score=False).
    """

    feature_dim: int
    layers: Sequence[int]
    use_layernorm: bool = False

    @nn.compact
    def __call__(self, kpts, mask, train: bool):
        channels = list(self.layers) + [self.feature_dim]
        return MLP1d(channels, self.use_layernorm, name="encoder")(
            kpts, mask, train
        )


class MultiHeadedAttention(nn.Module):
    """Reference: models/gmatcher.py:99-114.

    Torch reshapes (B, C, N) -> (B, head_dim, heads, N): the head index is
    the FAST axis of the channel dim (c = d*H + h). We keep (B, N, D, H)
    and flatten the trailing two axes, which reproduces that exact channel
    interleave — required for checkpoint-import fidelity.
    """

    num_heads: int
    d_model: int
    dtype: Any = jnp.float32
    attn_impl: str = "auto"

    @nn.compact
    def __call__(self, query, key, value, key_mask):
        b, n, _ = query.shape
        m = key.shape[1]
        dim = self.d_model // self.num_heads
        q = nn.Dense(self.d_model, dtype=self.dtype, name="proj_q")(query)
        k = nn.Dense(self.d_model, dtype=self.dtype, name="proj_k")(key)
        v = nn.Dense(self.d_model, dtype=self.dtype, name="proj_v")(value)
        # channel c = d * num_heads + h  (torch .view(B, dim, heads, N))
        q = q.reshape(b, n, dim, self.num_heads).transpose(0, 1, 3, 2)
        k = k.reshape(b, m, dim, self.num_heads).transpose(0, 1, 3, 2)
        v = v.reshape(b, m, dim, self.num_heads).transpose(0, 1, 3, 2)
        x = masked_attention(q, k, v, key_mask, impl=self.attn_impl)
        x = x.transpose(0, 1, 3, 2).reshape(b, n, self.d_model)
        return nn.Dense(self.d_model, dtype=self.dtype, name="merge")(x)


class AttentionalPropagation(nn.Module):
    """Reference: models/gmatcher.py:116-125."""

    feature_dim: int
    num_heads: int
    use_layernorm: bool = False
    dtype: Any = jnp.float32
    attn_impl: str = "auto"

    @nn.compact
    def __call__(self, x, source, x_mask, source_mask, train: bool):
        message = MultiHeadedAttention(
            self.num_heads, self.feature_dim, dtype=self.dtype,
            attn_impl=self.attn_impl, name="attn"
        )(x, source, source, source_mask)
        cat = jnp.concatenate([x, message], axis=-1)
        return MLP1d(
            [self.feature_dim * 2, self.feature_dim],
            self.use_layernorm,
            dtype=self.dtype,
            name="mlp",
        )(cat, x_mask, train)


class AttentionalGNN(nn.Module):
    """Alternating self/cross attention stack
    (reference: models/gmatcher.py:127-143)."""

    feature_dim: int
    layer_names: Sequence[str]
    num_heads: int = 4
    use_layernorm: bool = False
    dtype: Any = jnp.float32
    attn_impl: str = "auto"
    remat: bool = False
    stack_sides: bool = True

    @nn.compact
    def __call__(self, desc0, desc1, mask0, mask1, train: bool):
        # remat: recompute each layer's attention in the backward pass
        # instead of storing (B, H, N, M) softmax residuals — required to
        # train at eval-scale N (static_argnums: `train` at position 5
        # counting the module instance as 0).
        layer_cls = (
            nn.remat(AttentionalPropagation, static_argnums=(5,))
            if self.remat else AttentionalPropagation
        )
        layers = [
            layer_cls(
                self.feature_dim, self.num_heads, self.use_layernorm,
                dtype=self.dtype, attn_impl=self.attn_impl, name=f"layer_{i}",
            )
            for i in range(len(self.layer_names))
        ]
        if self.stack_sides and not train and desc0.shape == desc1.shape:
            # One stacked batch of 2B per layer: halves the dispatch count
            # and doubles the matmul rows per Dense. Bit-exact at eval
            # (BatchNorm reads running stats; per-row math is unchanged).
            b = desc0.shape[0]
            x = jnp.concatenate([desc0, desc1], axis=0)
            masks = jnp.concatenate([mask0, mask1], axis=0)
            masks_sw = jnp.concatenate([mask1, mask0], axis=0)
            for layer, name in zip(layers, self.layer_names):
                if name == "cross":
                    src = jnp.concatenate([x[b:], x[:b]], axis=0)
                    sm = masks_sw
                else:
                    src, sm = x, masks
                x = x + layer(x, src, masks, sm, train).astype(x.dtype)
            return x[:b], x[b:]
        for layer, name in zip(layers, self.layer_names):
            if name == "cross":
                src0, src1 = desc1, desc0
                sm0, sm1 = mask1, mask0
            else:
                src0, src1 = desc0, desc1
                sm0, sm1 = mask0, mask1
            delta0 = layer(desc0, src0, mask0, sm0, train)
            delta1 = layer(desc1, src1, mask1, sm1, train)
            desc0 = desc0 + delta0.astype(desc0.dtype)
            desc1 = desc1 + delta1.astype(desc1.dtype)
        return desc0, desc1


class SAGEConv(nn.Module):
    """DGL-style GraphSAGE mean-aggregation layer on a dense adjacency.

    rst = fc_self(h) + fc_neigh(mean_{j in N(i)} h_j) + bias
    (reference uses dgl.nn.SAGEConv('mean'), models/gmatcher.py:145-162;
    fc_self/fc_neigh are bias-free Linears plus one additive bias).
    Zero-degree nodes aggregate a zero vector.
    """

    out_feats: int

    @nn.compact
    def __call__(self, h, adj, mask):
        # h: (B, N, C); adj: (B, N, N) bool; mask: (B, N)
        a = adj.astype(h.dtype)
        deg = jnp.sum(a, axis=-1, keepdims=True)
        # HIGH (3-pass bf16) is plenty for a 0/1-adjacency mean aggregation
        # feeding a bf16 attention trunk; HIGHEST (6-pass) doubled the MXU
        # time of the biggest SAGE matmul for no visible accuracy gain
        neigh = jnp.matmul(a, h, precision=jax.lax.Precision.HIGH)
        neigh = neigh / jnp.maximum(deg, 1.0)
        out = (
            nn.Dense(self.out_feats, use_bias=False, name="fc_self")(h)
            + nn.Dense(self.out_feats, use_bias=False, name="fc_neigh")(neigh)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.out_feats,))
        return out + bias


class GraphSAGE(nn.Module):
    """3-layer SAGE encoder 256 -> 128 -> 128 -> 256 with ReLU between
    layers (reference: models/gmatcher.py:145-162, built at 192-197)."""

    in_feats: int
    hidden_feats: int
    out_feats: int
    num_layers: int = 3

    @nn.compact
    def __call__(self, h, adj, mask):
        dims = (
            [self.hidden_feats] * (self.num_layers - 1) + [self.out_feats]
        )
        for i, d in enumerate(dims):
            h = SAGEConv(d, name=f"layer_{i}")(h, adj, mask)
            if i != len(dims) - 1:
                h = nn.relu(h)
        return h
