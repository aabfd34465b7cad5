"""Matcher trunk tests: attention equivalence, mask-aware normalization
parity vs torch oracles, SAGE aggregation parity, and padding invariance of
the full pipeline."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from gims_tpu.config import AGCConfig, MatcherConfig
from gims_tpu.matcher.attention import (
    masked_attention_direct,
    masked_attention_flash,
)
from gims_tpu.matcher.layers import MaskedBatchNorm, SAGEConv
from gims_tpu.matcher.gmatcher import GMatcher, normalize_keypoints
from gims_tpu.matcher import pipeline


def test_flash_equals_direct(rng):
    b, n, m, h, d = 2, 37, 129, 4, 16
    q = jnp.asarray(rng.randn(b, n, h, d).astype(np.float32))
    k = jnp.asarray(rng.randn(b, m, h, d).astype(np.float32))
    v = jnp.asarray(rng.randn(b, m, h, d).astype(np.float32))
    mask = jnp.asarray(rng.rand(b, m) < 0.7)
    out_d = masked_attention_direct(q, k, v, mask)
    out_f = masked_attention_flash(q, k, v, mask, block_size=32)
    np.testing.assert_allclose(
        np.asarray(out_d), np.asarray(out_f), rtol=2e-5, atol=2e-5
    )


@pytest.mark.parametrize("n,m", [(64, 64), (100, 260)])
def test_pallas_attention_equals_direct(rng, n, m):
    """Interpret-mode run of the fused TPU kernel vs the direct path,
    including non-block-multiple shapes (pad/unpad) and bf16 inputs."""
    from gims_tpu.matcher.pallas_attention import masked_attention_pallas

    b, h, d = 2, 4, 16
    q = jnp.asarray(rng.randn(b, n, h, d).astype(np.float32))
    k = jnp.asarray(rng.randn(b, m, h, d).astype(np.float32))
    v = jnp.asarray(rng.randn(b, m, h, d).astype(np.float32))
    mask = jnp.asarray(rng.rand(b, m) < 0.7)
    out_d = masked_attention_direct(q, k, v, mask)
    out_p = masked_attention_pallas(q, k, v, mask, block_q=64, block_k=64,
                                    interpret=True)
    np.testing.assert_allclose(
        np.asarray(out_d), np.asarray(out_p), rtol=2e-5, atol=2e-5
    )

    qb, kb, vb = (x.astype(jnp.bfloat16) for x in (q, k, v))
    out_db = masked_attention_direct(qb, kb, vb, mask)
    out_pb = masked_attention_pallas(qb, kb, vb, mask, block_q=64,
                                     block_k=64, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out_db, np.float32), np.asarray(out_pb, np.float32),
        rtol=0.05, atol=0.05,
    )


def test_identity_warm_start_scores_are_descriptor_similarity(rng):
    """init_scheme='identity': the untrained trunk must be the identity,
    so the score matrix equals alpha * cos-similarity of the 128-d
    descriptors (alpha = 10)."""
    from gims_tpu.api import init_gmatcher_variables

    mcfg = MatcherConfig(sinkhorn_iterations=5, init_scheme="identity")
    v = init_gmatcher_variables(mcfg, seed=3, scheme="identity")

    n = 24
    d128 = np.abs(rng.randn(2, n, 128)).astype(np.float32)  # SIFT-like >= 0
    d128 /= np.linalg.norm(d128, axis=-1, keepdims=True)
    desc = np.concatenate([d128, d128], axis=-1)
    kpts = rng.rand(2, n, 2).astype(np.float32)
    adj = np.zeros((2, n, n), bool)
    kept = np.ones((2, n), bool)

    out = GMatcher(mcfg).apply(
        v, jnp.asarray(kpts[:1]), jnp.asarray(desc[:1]),
        jnp.asarray(adj[:1]), jnp.asarray(kept[:1]),
        jnp.asarray(kpts[1:]), jnp.asarray(desc[1:]),
        jnp.asarray(adj[1:]), jnp.asarray(kept[1:]), train=False,
    )
    want = 10.0 * (d128[0] @ d128[1].T)
    np.testing.assert_allclose(np.asarray(out["scores"][0]), want,
                               rtol=1e-4, atol=1e-4)


def test_masked_batchnorm_vs_torch(rng):
    import torch

    b, n, c = 2, 50, 8
    x = rng.randn(b, n, c).astype(np.float32)
    mask = np.zeros((b, n), bool)
    mask[0, :30] = True
    mask[1, :45] = True

    bn = MaskedBatchNorm(c)
    variables = bn.init(jax.random.PRNGKey(0), jnp.asarray(x),
                        jnp.asarray(mask), True)
    y, updated = bn.apply(
        variables, jnp.asarray(x), jnp.asarray(mask), True,
        mutable=["batch_stats"],
    )

    tbn = torch.nn.BatchNorm1d(c)
    tbn.train()
    # compact tokens exactly like the unpadded reference would see them
    flat = np.concatenate([x[0, :30], x[1, :45]], 0)  # (75, C)
    ty = tbn(torch.from_numpy(flat[None].transpose(0, 2, 1)))
    ty = ty.detach().numpy()[0].T

    got = np.concatenate(
        [np.asarray(y)[0, :30], np.asarray(y)[1, :45]], 0
    )
    np.testing.assert_allclose(got, ty, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(updated["batch_stats"]["mean"]),
        tbn.running_mean.numpy(), rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(updated["batch_stats"]["var"]),
        tbn.running_var.numpy(), rtol=1e-4, atol=1e-5,
    )


def test_sage_conv_mean_aggregation(rng):
    n, cin, cout = 20, 6, 5
    h = rng.randn(1, n, cin).astype(np.float32)
    adj = rng.rand(1, n, n) < 0.2
    adj = adj | adj.transpose(0, 2, 1)
    adj[:, np.arange(n), np.arange(n)] = False
    mask = np.ones((1, n), bool)

    conv = SAGEConv(cout)
    variables = conv.init(
        jax.random.PRNGKey(1), jnp.asarray(h), jnp.asarray(adj),
        jnp.asarray(mask),
    )
    out = np.asarray(
        conv.apply(variables, jnp.asarray(h), jnp.asarray(adj), jnp.asarray(mask))
    )

    p = variables["params"]
    w_self = np.asarray(p["fc_self"]["kernel"])   # (cin, cout)
    w_neigh = np.asarray(p["fc_neigh"]["kernel"])
    bias = np.asarray(p["bias"])
    want = np.zeros((n, cout), np.float32)
    for i in range(n):
        nbrs = np.nonzero(adj[0, i])[0]
        agg = h[0, nbrs].mean(0) if len(nbrs) else np.zeros(cin, np.float32)
        want[i] = h[0, i] @ w_self + agg @ w_neigh + bias
    np.testing.assert_allclose(out[0], want, rtol=1e-5, atol=1e-5)


def test_normalize_keypoints_modes():
    kpts = jnp.asarray([[0.0, 0.0], [640.0, 480.0], [320.0, 240.0]])
    std = np.asarray(normalize_keypoints(kpts, 480, 640, "standard"))
    np.testing.assert_allclose(std[2], [0.0, 0.0], atol=1e-6)
    np.testing.assert_allclose(std[1], [320 / (0.7 * 640), 240 / (0.7 * 640)])
    gims = np.asarray(normalize_keypoints(kpts, 480, 640, "gims"))
    # reference-as-executed: center (1.5, W/2), scale 0.7*W on both axes
    np.testing.assert_allclose(gims[0], [-1.5 / 448.0, -320 / 448.0])


def _random_pair(rng, n0, n1, nb0, nb1, d=64):
    kp0 = np.full((nb0, 2), 1e6, np.float32)
    kp0[:n0] = rng.rand(n0, 2).astype(np.float32) * 300
    de0 = np.zeros((nb0, d), np.float32)
    de0[:n0] = rng.randn(n0, d)
    v0 = np.zeros(nb0, bool)
    v0[:n0] = True
    kp1 = np.full((nb1, 2), 1e6, np.float32)
    kp1[:n1] = rng.rand(n1, 2).astype(np.float32) * 300
    de1 = np.zeros((nb1, d), np.float32)
    de1[:n1] = rng.randn(n1, d)
    v1 = np.zeros(nb1, bool)
    v1[:n1] = True
    return kp0, de0, v0, kp1, de1, v1


def _mcfg(d=64):
    return MatcherConfig(
        descriptor_dim=d, keypoint_encoder=(32, 64), num_gnn_layers=4,
        sinkhorn_iterations=10, match_threshold=0.02, input_dim=d,
    )


def _init_vars(mcfg, nb0=32, nb1=32):
    gm = GMatcher(mcfg)
    dummy = lambda n: (
        jnp.zeros((1, n, 2)), jnp.zeros((1, n, mcfg.input_dim)),
        jnp.zeros((1, n, n), bool), jnp.ones((1, n), bool),
    )
    k0, d0, a0, m0 = dummy(nb0)
    k1, d1, a1, m1 = dummy(nb1)
    return gm.init(jax.random.PRNGKey(0), k0, d0, a0, m0, k1, d1, a1, m1)


def test_pipeline_padding_invariance(rng):
    """Growing the padding bucket must not change results on valid slots."""
    mcfg = _mcfg()
    acfg = AGCConfig(radius=60.0, percentile=10.0, min_size=3)
    variables = _init_vars(mcfg)
    n0, n1 = 40, 55
    kp0, de0, v0, kp1, de1, v1 = _random_pair(rng, n0, n1, 64, 64)

    def run(nb0, nb1):
        pad = lambda a, nb, fill: np.concatenate(
            [a, np.full((nb - a.shape[0],) + a.shape[1:], fill, a.dtype)]
        )
        out = pipeline.forward_match(
            variables, mcfg, acfg,
            jnp.asarray(pad(kp0, nb0, 1e6))[None],
            jnp.asarray(pad(de0, nb0, 0))[None],
            jnp.asarray(pad(v0, nb0, False))[None],
            jnp.asarray(pad(kp1, nb1, 1e6))[None],
            jnp.asarray(pad(de1, nb1, 0))[None],
            jnp.asarray(pad(v1, nb1, False))[None],
            image_shape=(480, 640),
            k0=jnp.asarray([pipeline.percentile_rank(n0, acfg.percentile)]),
            k1=jnp.asarray([pipeline.percentile_rank(n1, acfg.percentile)]),
        )
        return {k: np.asarray(val) for k, val in out.items()}

    small = run(64, 64)
    big = run(96, 128)
    np.testing.assert_array_equal(small["kept0"][0, :64], big["kept0"][0, :64])
    np.testing.assert_array_equal(
        small["matches0"][0, :n0], big["matches0"][0, :n0]
    )
    np.testing.assert_allclose(
        small["matching_scores0"][0, :n0], big["matching_scores0"][0, :n0],
        rtol=1e-4, atol=1e-5,
    )
    assert (big["matches0"][0, n0:] == -1).all()


def test_stack_sides_parity(rng):
    """stack_sides=True (both sides through the trunk as one batch of 2B)
    must reproduce the two-call path exactly at eval: BatchNorm reads
    running stats, so per-row math is unchanged."""
    import dataclasses

    acfg = AGCConfig(radius=60.0, percentile=10.0, min_size=3)
    kp0, de0, v0, kp1, de1, v1 = _random_pair(rng, 50, 64, 64, 64)
    args = [jnp.asarray(a)[None] for a in (kp0, de0, v0, kp1, de1, v1)]

    outs = {}
    for flag in (True, False):
        mcfg = dataclasses.replace(_mcfg(), stack_sides=flag)
        variables = _init_vars(mcfg)
        outs[flag] = {
            k: np.asarray(val)
            for k, val in pipeline.forward_match(
                variables, mcfg, acfg, *args, image_shape=(64, 64)
            ).items()
        }
    for k in outs[True]:
        np.testing.assert_allclose(
            outs[True][k], outs[False][k], rtol=1e-6, atol=1e-6,
            err_msg=k,
        )


def test_training_forward_losses_and_grads(rng):
    mcfg = _mcfg()
    acfg = AGCConfig(radius=80.0, percentile=10.0, min_size=2)
    variables = _init_vars(mcfg)
    n0 = n1 = 48
    kp0, de0, v0, kp1, de1, v1 = _random_pair(rng, n0, n1, 64, 64)
    # fabricate GT: i <-> i for first 20, then misses
    rows = []
    for i in range(20):
        rows.append([0, i, i])
    for i in range(20, 30):
        rows.append([0, i, -1])
        rows.append([0, -1, i])
    gt = np.array(rows, np.int64)
    gtv = np.ones(len(rows), bool)

    def loss_fn(params):
        total, (pos, neg, _) = pipeline.training_forward(
            {"params": params, "batch_stats": variables.get("batch_stats", {})},
            mcfg, acfg,
            jnp.asarray(kp0)[None], jnp.asarray(de0)[None], jnp.asarray(v0)[None],
            jnp.asarray(kp1)[None], jnp.asarray(de1)[None], jnp.asarray(v1)[None],
            jnp.asarray(gt), jnp.asarray(gtv),
            image_shape=(480, 640),
        )
        return total, (pos, neg)

    (total, (pos, neg)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        variables["params"]
    )
    assert np.isfinite(float(total))
    assert float(pos) >= 0 and float(neg) >= 0
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    assert any(np.abs(np.asarray(l)).max() > 0 for l in leaves)


def test_pipeline_compact_to_parity(rng):
    """compact_to large enough to hold every kept keypoint must reproduce
    the uncompacted results (trunk math is permutation-equivariant up to
    float rounding); overflow must drop the lowest-score kept keypoints."""
    mcfg = _mcfg()
    acfg = AGCConfig(radius=60.0, percentile=10.0, min_size=3)
    variables = _init_vars(mcfg)
    n0, n1 = 40, 55
    nb = 64
    kp0, de0, v0, kp1, de1, v1 = _random_pair(rng, n0, n1, 64, 64)

    def pad(a, fill):
        return np.concatenate(
            [a, np.full((nb - a.shape[0],) + a.shape[1:], fill, a.dtype)]
        )

    args = (
        jnp.asarray(pad(kp0, 1e6))[None], jnp.asarray(pad(de0, 0))[None],
        jnp.asarray(pad(v0, False))[None],
        jnp.asarray(pad(kp1, 1e6))[None], jnp.asarray(pad(de1, 0))[None],
        jnp.asarray(pad(v1, False))[None],
    )
    kw = dict(
        image_shape=(480, 640),
        k0=jnp.asarray([pipeline.percentile_rank(n0, acfg.percentile)]),
        k1=jnp.asarray([pipeline.percentile_rank(n1, acfg.percentile)]),
    )
    scores = (jnp.asarray(pad(
        rng.rand(n0).astype(np.float32) + 0.1, 0.0))[None],
        jnp.asarray(pad(rng.rand(n1).astype(np.float32) + 0.1, 0.0))[None])

    base = {k: np.asarray(v) for k, v in pipeline.forward_match(
        variables, mcfg, acfg, *args, **kw).items()}
    comp = {k: np.asarray(v) for k, v in pipeline.forward_match(
        variables, mcfg, acfg, *args, **kw, compact_to=56,
        scores0=scores[0], scores1=scores[1]).items()}

    np.testing.assert_array_equal(base["kept0"], comp["kept0"])
    np.testing.assert_array_equal(base["kept1"], comp["kept1"])
    np.testing.assert_array_equal(base["matches0"], comp["matches0"])
    np.testing.assert_array_equal(base["matches1"], comp["matches1"])
    np.testing.assert_allclose(base["matching_scores0"],
                               comp["matching_scores0"], rtol=2e-3, atol=1e-4)
    # mdesc rows for kept keypoints survive the round trip
    k = base["kept0"][0]
    np.testing.assert_allclose(base["mdesc0"][0][k], comp["mdesc0"][0][k],
                               rtol=2e-3, atol=1e-4)

    # overflow: a tiny compact bucket keeps only the top-score kept rows
    tiny = {k: np.asarray(v) for k, v in pipeline.forward_match(
        variables, mcfg, acfg, *args, **kw, compact_to=16,
        scores0=scores[0], scores1=scores[1]).items()}
    assert tiny["kept0"][0].sum() <= 16
    sc0 = np.asarray(scores[0][0])
    kept_scores = sc0[tiny["kept0"][0]]
    dropped = base["kept0"][0] & ~tiny["kept0"][0]
    if dropped.any() and tiny["kept0"][0].any():
        assert kept_scores.min() >= sc0[dropped].max()


def test_ring_attention_equals_direct(rng):
    """Keypoint-sharded ring attention over the 8-virtual-device mesh
    agrees with dense masked attention (flash math across ppermute steps)."""
    import numpy as np
    from jax.sharding import Mesh

    from gims_tpu.matcher.attention import masked_attention_direct
    from gims_tpu.matcher.ring_attention import masked_attention_ring

    b, n, m, h, d = 2, 64, 64, 4, 32
    q = jnp.asarray(rng.randn(b, n, h, d).astype(np.float32))
    k = jnp.asarray(rng.randn(b, m, h, d).astype(np.float32))
    v = jnp.asarray(rng.randn(b, m, h, d).astype(np.float32))
    mask = jnp.asarray(rng.rand(b, m) > 0.3)

    mesh = Mesh(np.array(jax.devices()), ("kp",))
    want = masked_attention_direct(q, k, v, mask)
    got = masked_attention_ring(q, k, v, mask, mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)
