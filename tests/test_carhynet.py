"""CAR-HyNet tests: primitive math checks, torch conv-padding equivalence,
and converter <-> flax tree compatibility."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from gims_tpu.carhynet.model import (
    CARHyNet, FRN, TLU, CoordAtt, SandGlass, h_swish, desc_l2norm, _conv,
)
from gims_tpu.carhynet.convert import convert_carhynet_torch
from gims_tpu.carhynet.engine import DescriptorEngine


def test_frn_formula(rng):
    x = rng.randn(2, 5, 5, 4).astype(np.float32)
    m = FRN(4)
    v = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    v = jax.tree_util.tree_map(lambda a: a, v)
    v["params"]["weight"] = jnp.asarray([1.0, 2.0, 0.5, -1.0])
    v["params"]["bias"] = jnp.asarray([0.0, 0.1, -0.2, 0.3])
    got = np.asarray(m.apply(v, jnp.asarray(x)))
    nu2 = (x**2).mean(axis=(1, 2), keepdims=True)
    want = x / np.sqrt(nu2 + 1e-6)
    want = want * np.array([1.0, 2.0, 0.5, -1.0]) + np.array([0.0, 0.1, -0.2, 0.3])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_tlu_formula(rng):
    x = rng.randn(3, 4, 4, 2).astype(np.float32)
    m = TLU(2)
    v = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    got = np.asarray(m.apply(v, jnp.asarray(x)))
    np.testing.assert_allclose(got, np.maximum(x, -1.0))


def test_hswish():
    x = jnp.asarray([-4.0, -3.0, -1.0, 0.0, 1.0, 3.0, 10.0])
    got = np.asarray(h_swish(x))
    relu6 = np.clip(np.asarray(x) + 3, 0, 6)
    want = np.asarray(x) * relu6 / 6
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_conv_padding_matches_torch(rng):
    """Explicit ((1,1),(1,1)) padding must reproduce torch Conv2d(padding=1)
    for stride 2 (XLA SAME would shift the sampling grid)."""
    import torch

    x = rng.randn(1, 16, 16, 3).astype(np.float32)
    conv = _conv(8, 3, stride=2, bias=True, name=None)
    v = conv.init(jax.random.PRNGKey(0), jnp.asarray(x))
    got = np.asarray(conv.apply(v, jnp.asarray(x)))

    w = np.asarray(v["params"]["kernel"])  # HWIO
    b = np.asarray(v["params"]["bias"])
    tw = torch.from_numpy(w.transpose(3, 2, 0, 1).copy())  # OIHW
    tx = torch.from_numpy(x.transpose(0, 3, 1, 2).copy())
    ty = torch.nn.functional.conv2d(tx, tw, torch.from_numpy(b), stride=2,
                                    padding=1)
    want = ty.numpy().transpose(0, 2, 3, 1)
    assert got.shape == want.shape == (1, 8, 8, 8)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_coordatt_manual(rng):
    x = rng.randn(1, 6, 5, 8).astype(np.float32)
    m = CoordAtt(8, 8)
    v = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    got = np.asarray(m.apply(v, jnp.asarray(x)))

    p = v["params"]
    s = v["batch_stats"]

    def conv1x1(inp, kernel, bias):
        k = np.asarray(kernel)[0, 0]  # (I, O)
        return inp @ k + np.asarray(bias)

    x_h = x.mean(axis=2, keepdims=True)          # (1, H, 1, C)
    x_w = x.mean(axis=1, keepdims=True).transpose(0, 2, 1, 3)  # (1, W, 1, C)
    y = np.concatenate([x_h, x_w], axis=1)
    y = conv1x1(y, p["conv1"]["kernel"], p["conv1"]["bias"])
    mean, var = np.asarray(s["bn1"]["mean"]), np.asarray(s["bn1"]["var"])
    y = (y - mean) / np.sqrt(var + 1e-5)
    y = y * np.asarray(p["bn1"]["scale"]) + np.asarray(p["bn1"]["bias"])
    y = y * np.clip(y + 3, 0, 6) / 6
    y_h, y_w = y[:, :6], y[:, 6:].transpose(0, 2, 1, 3)
    sig = lambda t: 1 / (1 + np.exp(-t))
    a_h = sig(conv1x1(y_h, p["conv_h"]["kernel"], p["conv_h"]["bias"]))
    a_w = sig(conv1x1(y_w, p["conv_w"]["kernel"], p["conv_w"]["bias"]))
    want = x * a_w * a_h
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def _torch_like_state_dict(rng):
    """Shape-faithful random state dict in the reference checkpoint layout."""
    sd = {}

    def conv(p, o, i, k, bias=True):
        sd[f"{p}.weight"] = rng.randn(o, i, k, k).astype(np.float32) * 0.1
        if bias:
            sd[f"{p}.bias"] = rng.randn(o).astype(np.float32) * 0.01

    def frn(p, c):
        sd[f"{p}.weight"] = rng.rand(1, c, 1, 1).astype(np.float32) + 0.5
        sd[f"{p}.bias"] = rng.randn(1, c, 1, 1).astype(np.float32) * 0.01
        sd[f"{p}.eps"] = np.array([1e-6], np.float32)

    def tlu(p, c):
        sd[f"{p}.tau"] = np.full((1, c, 1, 1), -1.0, np.float32)

    def bn(p, c, affine=True):
        if affine:
            sd[f"{p}.weight"] = rng.rand(c).astype(np.float32) + 0.5
            sd[f"{p}.bias"] = rng.randn(c).astype(np.float32) * 0.01
        sd[f"{p}.running_mean"] = rng.randn(c).astype(np.float32) * 0.01
        sd[f"{p}.running_var"] = rng.rand(c).astype(np.float32) + 0.5
        sd[f"{p}.num_batches_tracked"] = np.array(100)

    def coord(p, c):
        mip = max(8, c // 32)
        conv(f"{p}.conv1", mip, c, 1)
        bn(f"{p}.bn1", mip)
        conv(f"{p}.conv_h", c, mip, 1)
        conv(f"{p}.conv_w", c, mip, 1)

    def sandglass(p, c):
        hidden = 16
        sd[f"{p}.conv.0.0.weight"] = rng.randn(c, 1, 3, 3).astype(np.float32) * 0.1
        bn(f"{p}.conv.0.1", c)
        coord(f"{p}.conv.1", c)
        conv(f"{p}.conv.2", hidden, c, 1, bias=False)
        bn(f"{p}.conv.3", hidden)
        conv(f"{p}.conv.4.0", c, hidden, 1, bias=False)
        bn(f"{p}.conv.4.1", c)
        sd[f"{p}.conv.5.weight"] = rng.randn(c, 1, 3, 3).astype(np.float32) * 0.1
        bn(f"{p}.conv.6", c)

    frn("layer1.0", 3); tlu("layer1.1", 3); conv("layer1.2", 32, 3, 3)
    frn("layer1.3", 32); coord("layer1.4", 32); tlu("layer1.5", 32)
    conv("layer2.0", 32, 32, 3); frn("layer2.1", 32); coord("layer2.2", 32)
    tlu("layer2.3", 32); sandglass("layer2_5", 32)
    conv("layer3.0", 64, 32, 3); frn("layer3.1", 64); tlu("layer3.2", 64)
    conv("layer4.0", 64, 64, 3); frn("layer4.1", 64); tlu("layer4.2", 64)
    sandglass("layer4_5", 64)
    conv("layer5.0", 128, 64, 3); frn("layer5.1", 128); tlu("layer5.2", 128)
    conv("layer6.0", 128, 128, 3); frn("layer6.1", 128); tlu("layer6.2", 128)
    conv("layer7.1", 128, 128, 8, bias=False)
    bn("layer7.2", 128, affine=False)
    return sd


def test_converter_tree_matches_model(rng):
    sd = _torch_like_state_dict(rng)
    converted = convert_carhynet_torch(sd)

    model = CARHyNet()
    ref = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))

    def shapes(tree):
        return jax.tree_util.tree_map(lambda a: tuple(np.asarray(a).shape), tree)

    for col in ("params", "batch_stats"):
        want = shapes(ref[col])
        got = shapes(converted[col])
        assert want == got, (
            f"{col} tree mismatch:\nwant={want}\ngot={got}"
        )

    # converted weights must actually run and produce unit-norm descriptors
    x = rng.rand(5, 32, 32, 3).astype(np.float32)
    out = np.asarray(model.apply(converted, jnp.asarray(x)))
    assert out.shape == (5, 128)
    np.testing.assert_allclose(
        np.linalg.norm(out, axis=1), np.ones(5), rtol=1e-5
    )


def test_engine_bucketing(rng):
    eng = DescriptorEngine(seed=0)
    p = rng.rand(7, 32, 32, 3).astype(np.float32)
    d7 = eng.compute(p)
    d3 = eng.compute(p[:3])
    assert d7.shape == (7, 128)
    np.testing.assert_allclose(d7[:3], d3, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.linalg.norm(d7, axis=1), 1.0, rtol=1e-5)
