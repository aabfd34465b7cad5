"""CAR-HyNet patch descriptor CNN in flax (NHWC).

Architecture parity with reference carhynet/models.py:311-399:
7 stages over 32x32x3 patches -> 128-d L2-normalized descriptor, built from
FRN/TLU (filter response normalization), CoordAtt (coordinate attention),
and SandGlass inverted-residual blocks.

TPU notes: all convs use *explicit* symmetric padding ((p,p),(p,p)) with
p=(k-1)//2 so stride-2 sampling positions match torch's Conv2d(padding=1)
(XLA "SAME" pads asymmetrically and would shift the grid). The whole patch
set runs as one batched jit per bucket instead of the reference's Python
loop over chunks of 512 (reference: carhynet/models.py:655-665).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

EPS_L2_NORM = 1e-10  # reference carhynet/util.py:10


class FRN(nn.Module):
    """Filter response normalization (reference: carhynet/models.py:23-82)."""

    num_features: int
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        weight = self.param("weight", nn.initializers.ones, (self.num_features,))
        bias = self.param("bias", nn.initializers.zeros, (self.num_features,))
        # nu2: mean of squares over spatial dims per (sample, channel).
        # Accumulate in f32 so the module stays correct when the whole
        # network is run in bf16 (dense frontend speed path).
        nu2 = jnp.mean(jnp.square(x), axis=(1, 2), keepdims=True,
                       dtype=jnp.float32)
        x = x * jax.lax.rsqrt(nu2 + abs(self.eps)).astype(x.dtype)
        return weight.astype(x.dtype) * x + bias.astype(x.dtype)


class TLU(nn.Module):
    """Thresholded linear unit: max(x, tau), tau learnable (init -1)."""

    num_features: int

    @nn.compact
    def __call__(self, x):
        tau = self.param(
            "tau", lambda k, s: jnp.full(s, -1.0, jnp.float32),
            (self.num_features,),
        )
        return jnp.maximum(x, tau.astype(x.dtype))


def h_sigmoid(x):
    return jnp.clip(x + 3.0, 0.0, 6.0) / 6.0


def h_swish(x):
    return x * h_sigmoid(x)


def _bn(name, train, affine=True):
    return nn.BatchNorm(
        use_running_average=not train, momentum=0.9, epsilon=1e-5,
        use_scale=affine, use_bias=affine, name=name,
    )


class CoordAtt(nn.Module):
    """Coordinate attention (reference: carhynet/models.py:127-153).

    Pools over W and H separately, mixes through a shared 1x1 bottleneck,
    and gates the input with per-row and per-column sigmoids.
    """

    inp: int
    oup: int
    reduction: int = 32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: (B, H, W, C)
        b, h, w, c = x.shape
        mip = max(8, self.inp // self.reduction)
        x_h = jnp.mean(x, axis=2, keepdims=True,
                       dtype=jnp.float32).astype(x.dtype)  # (B, H, 1, C)
        x_w = jnp.mean(x, axis=1, keepdims=True,
                       dtype=jnp.float32).astype(x.dtype)  # (B, 1, W, C)
        x_w_t = jnp.transpose(x_w, (0, 2, 1, 3))  # (B, W, 1, C)
        y = jnp.concatenate([x_h, x_w_t], axis=1)  # (B, H+W, 1, C)
        y = nn.Conv(mip, (1, 1), use_bias=True, name="conv1")(y)
        y = _bn("bn1", train)(y)
        y = h_swish(y)
        y_h, y_w = y[:, :h], y[:, h:]
        y_w = jnp.transpose(y_w, (0, 2, 1, 3))  # (B, 1, W, C)
        a_h = jax.nn.sigmoid(nn.Conv(self.oup, (1, 1), name="conv_h")(y_h))
        a_w = jax.nn.sigmoid(nn.Conv(self.oup, (1, 1), name="conv_w")(y_w))
        return x * a_w * a_h


def _conv(features, kernel, stride=1, groups=1, bias=False, name=None):
    k = kernel if isinstance(kernel, tuple) else (kernel, kernel)
    p = (k[0] - 1) // 2
    return nn.Conv(
        features, k, strides=(stride, stride),
        padding=((p, p), (p, p)), feature_group_count=groups,
        use_bias=bias, name=name,
    )


class ConvBNReLU6(nn.Module):
    """conv(no bias) + BN + ReLU6 (reference: carhynet/models.py:172-180)."""

    features: int
    kernel: int = 3
    stride: int = 1
    groups: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = _conv(self.features, self.kernel, self.stride, self.groups,
                  name="conv")(x)
        x = _bn("bn", train)(x)
        return jnp.clip(x, 0.0, 6.0)


def _make_divisible(v, divisor, min_value=None):
    if min_value is None:
        min_value = divisor
    new_v = max(min_value, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


class SandGlass(nn.Module):
    """Inverted sand-glass residual (reference: carhynet/models.py:182-235).

    As used by CAR-HyNet: stride 1, inp == oup, expand_ratio 6, full
    identity residual.
    """

    inp: int
    oup: int
    stride: int = 1
    expand_ratio: int = 6
    keep_3x3: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        hidden = self.inp // self.expand_ratio
        if hidden < self.oup / 6.0:
            hidden = _make_divisible(math.ceil(self.oup / 6.0), 16)
        use_res = self.stride == 1 and self.inp == self.oup

        out = x
        first_dw = (self.expand_ratio == 2 or self.inp == self.oup
                    or self.keep_3x3)
        if first_dw:
            out = ConvBNReLU6(self.inp, 3, 1, groups=self.inp, name="dw1")(
                out, train
            )
        out = CoordAtt(self.inp, self.inp, name="coord")(out, train)
        if self.expand_ratio != 1:
            out = _conv(hidden, 1, name="pw_reduce")(out)
            out = _bn("pw_reduce_bn", train)(out)
        out = ConvBNReLU6(self.oup, 1, 1, name="pw_expand")(out, train)
        if first_dw or self.stride == 2:
            out = _conv(self.oup, 3, self.stride, groups=self.oup,
                        name="dw2")(out)
            out = _bn("dw2_bn", train)(out)
        return x + out if use_res else out


def desc_l2norm(desc):
    """L2 normalization with the reference's epsilon
    (reference: carhynet/models.py:9-21). f32 accumulation + f32 output
    regardless of the compute dtype."""
    desc = desc.astype(jnp.float32)
    denom = jnp.sqrt(jnp.sum(jnp.square(desc), axis=1, keepdims=True)
                     + EPS_L2_NORM)
    return desc / denom


class CARHyNet(nn.Module):
    """Reference: carhynet/models.py:311-399. Input (B, 32, 32, 3) in [0,1].

    dense=True runs the SAME parameter set fully convolutionally over an
    arbitrary (B, H, W, 3) image instead of per-patch: the final 8x8 VALID
    conv becomes SAME-padded, and the output is a stride-4 per-pixel
    L2-normalized descriptor map (B, ceil(H/4), ceil(W/4), dim_desc). This
    is the TPU-first replacement for warping one patch per keypoint
    (reference: utils/library.py:84-110): dense conv work is pure MXU,
    then descriptors are bilinearly sampled at keypoints (see
    frontend/dense.py)."""

    dim_desc: int = 128
    drop_rate: float = 0.2
    dense: bool = False
    # in_channels=1: grayscale variant for the dense_gray frontend — the
    # descriptor maps are computed from the DETECTION gray pyramid, so no
    # color pyramid is built and images upload as single-channel uint8
    # (3x less tunnel traffic). Weights are trained in-repo per variant.
    in_channels: int = 3

    @nn.compact
    def __call__(self, x, train: bool = False):
        # --- layer1 ---
        x = FRN(self.in_channels, name="l1_frn_in")(x)
        x = TLU(self.in_channels, name="l1_tlu_in")(x)
        x = _conv(32, 3, bias=True, name="l1_conv")(x)
        x = FRN(32, name="l1_frn")(x)
        x = CoordAtt(32, 32, name="l1_coord")(x, train)
        x = TLU(32, name="l1_tlu")(x)
        # --- layer2 + parallel sandglass ---
        y = _conv(32, 3, bias=True, name="l2_conv")(x)
        y = FRN(32, name="l2_frn")(y)
        y = CoordAtt(32, 32, name="l2_coord")(y, train)
        x1 = TLU(32, name="l2_tlu")(y)
        x2 = SandGlass(32, 32, 1, 6, name="l2_sg")(x1, train)
        x = x1 + x2
        # --- layer3 (stride 2 -> 64) ---
        x = _conv(64, 3, stride=2, bias=True, name="l3_conv")(x)
        x = FRN(64, name="l3_frn")(x)
        x = TLU(64, name="l3_tlu")(x)
        # --- layer4 + parallel sandglass ---
        y = _conv(64, 3, bias=True, name="l4_conv")(x)
        y = FRN(64, name="l4_frn")(y)
        x1 = TLU(64, name="l4_tlu")(y)
        x2 = SandGlass(64, 64, 1, 6, name="l4_sg")(x1, train)
        x = x1 + x2
        # --- layer5 (stride 2 -> 128) ---
        x = _conv(128, 3, stride=2, bias=True, name="l5_conv")(x)
        x = FRN(128, name="l5_frn")(x)
        x = TLU(128, name="l5_tlu")(x)
        # --- layer6 ---
        x = _conv(128, 3, bias=True, name="l6_conv")(x)
        x = FRN(128, name="l6_frn")(x)
        x = TLU(128, name="l6_tlu")(x)
        # --- layer7: dropout + 8x8 conv -> BN (no affine) ---
        if train and self.drop_rate > 0:
            x = nn.Dropout(self.drop_rate, deterministic=False)(x)
        pad = ((3, 4), (3, 4)) if self.dense else "VALID"
        x = nn.Conv(self.dim_desc, (8, 8), padding=pad, use_bias=False,
                    name="l7_conv")(x)
        x = _bn("l7_bn", train, affine=False)(x)
        if self.dense:
            x = x.astype(jnp.float32)
            denom = jnp.sqrt(
                jnp.sum(jnp.square(x), axis=-1, keepdims=True) + EPS_L2_NORM
            )
            desc_map = x / denom
            if train:
                return desc_map, x
            return desc_map
        desc_raw = x.reshape(x.shape[0], self.dim_desc)
        desc = desc_l2norm(desc_raw)
        if train:
            return desc, desc_raw
        return desc


class HyNet(nn.Module):
    """Plain HyNet (reference ablation model, carhynet/models.py:401-459):
    CAR-HyNet without CoordAtt/SandGlass, grayscale input."""

    dim_desc: int = 128
    drop_rate: float = 0.2
    in_channels: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        dims = [(32, 1), (32, 1), (64, 2), (64, 1), (128, 2), (128, 1)]
        x = FRN(self.in_channels, name="frn_in")(x)
        x = TLU(self.in_channels, name="tlu_in")(x)
        for i, (c, s) in enumerate(dims):
            x = _conv(c, 3, stride=s, bias=True, name=f"conv_{i}")(x)
            x = FRN(c, name=f"frn_{i}")(x)
            x = TLU(c, name=f"tlu_{i}")(x)
        if train and self.drop_rate > 0:
            x = nn.Dropout(self.drop_rate, deterministic=False)(x)
        x = nn.Conv(self.dim_desc, (8, 8), padding="VALID", use_bias=False,
                    name="head_conv")(x)
        x = _bn("head_bn", train, affine=False)(x)
        desc_raw = x.reshape(x.shape[0], self.dim_desc)
        desc = desc_l2norm(desc_raw)
        return (desc, desc_raw) if train else desc


class L2Net(nn.Module):
    """L2Net baseline (reference ablation model, carhynet/models.py:461-518):
    BN+ReLU conv stack, affine-less norms."""

    dim_desc: int = 128
    drop_rate: float = 0.3
    in_channels: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        # InstanceNorm (affine-less) on input
        mean = jnp.mean(x, axis=(1, 2), keepdims=True)
        var = jnp.var(x, axis=(1, 2), keepdims=True)
        x = (x - mean) * jax.lax.rsqrt(var + 1e-5)
        dims = [(32, 1), (32, 1), (64, 2), (64, 1), (128, 2), (128, 1)]
        for i, (c, s) in enumerate(dims):
            x = _conv(c, 3, stride=s, name=f"conv_{i}")(x)
            x = _bn(f"bn_{i}", train, affine=False)(x)
            x = nn.relu(x)
        if train and self.drop_rate > 0:
            x = nn.Dropout(self.drop_rate, deterministic=False)(x)
        x = nn.Conv(self.dim_desc, (8, 8), padding="VALID", use_bias=False,
                    name="head_conv")(x)
        x = _bn("head_bn", train, affine=False)(x)
        return desc_l2norm(x.reshape(x.shape[0], self.dim_desc))
