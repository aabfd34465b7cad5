"""Fused single-program pipeline: smoke + consistency with the staged API."""

import numpy as np
import cv2

from gims_tpu.fused import FusedMatching, octave_budgets


def _pair(h=96, w=128, seed=3):
    rng = np.random.RandomState(seed)
    img = rng.randint(0, 255, (h // 4, w // 4, 3)).astype(np.uint8)
    img = cv2.resize(img, (w, h), interpolation=cv2.INTER_CUBIC)
    img = cv2.GaussianBlur(img, (0, 0), 1.2)
    M = cv2.getRotationMatrix2D((w / 2, h / 2), 8, 0.97)
    H = np.eye(3, dtype=np.float32)
    H[:2] = M
    return img, cv2.warpPerspective(img, H, (w, h)), H


def test_octave_budgets_sum_and_caps():
    b = octave_budgets(600, 800, 12288)
    assert sum(b) == 12288
    assert all(x >= 32 for x in b)
    b2 = octave_budgets(96, 128, 256)
    assert sum(b2) == 256


def test_fused_end_to_end_contract():
    img0, img1, H = _pair()
    m = FusedMatching({"fast_frontend": True}, total_keypoints=256)
    pred = m(img0, img1)

    n0 = pred["keypoints0"].shape[1]
    n1 = pred["keypoints1"].shape[1]
    assert n0 > 30 and n1 > 30
    assert pred["matches0"].shape == (1, n0)
    assert pred["matches1"].shape == (1, n1)
    m0 = pred["matches0"][0]
    sel = m0 > -1
    # mutual consistency after compaction
    assert np.all(pred["matches1"][0][m0[sel]] == np.nonzero(sel)[0])
    # keypoints are inside the image
    kp = pred["keypoints0"][0]
    assert kp[:, 0].max() <= img0.shape[1] and kp[:, 1].max() <= img0.shape[0]

    # matched pairs should mostly satisfy the ground-truth homography
    # (random-weight matcher: just require the set is not empty and finite)
    assert np.isfinite(pred["matching_scores0"]).all()


def test_fused_batch_matches_single():
    """dispatch_batch over B=2 pairs must agree with two single-pair
    dispatches (eval-mode BatchNorm uses running stats; shapes static)."""
    pa = _pair(seed=3)
    pb = _pair(seed=7)
    m = FusedMatching({"fast_frontend": True}, total_keypoints=256)
    singles = [m.collect(m.dispatch(p[0], p[1])) for p in (pa, pb)]
    batch = m.collect_batch(
        m.dispatch_batch([pa[0], pb[0]], [pa[1], pb[1]])
    )
    assert len(batch) == 2
    for got, want in zip(batch, singles):
        assert got.keys() == want.keys()
        for k in want:
            assert got[k].shape == want[k].shape, k
            np.testing.assert_allclose(got[k], want[k], atol=2e-3, err_msg=k)


def test_fused_mesh_batch_matches_unsharded():
    """Multi-chip serving path: a pair batch sharded over the 8-virtual-
    device 'data' mesh must produce the same matches as the unsharded
    batched program (GSPMD partitioning is semantics-preserving)."""
    import jax

    pairs = [_pair(seed=s) for s in (3, 7, 11, 13)]
    i0 = [p[0] for p in pairs] * 2   # B=8 over 8 devices
    i1 = [p[1] for p in pairs] * 2
    base = FusedMatching({"fast_frontend": True}, total_keypoints=256)
    sharded = FusedMatching({"fast_frontend": True}, total_keypoints=256,
                            devices=len(jax.devices()))
    want = base.collect_batch(base.dispatch_batch(i0, i1))
    got = sharded.collect_batch(sharded.dispatch_batch(i0, i1))
    assert len(got) == len(want) == 8
    for g, w in zip(got, want):
        for k in w:
            assert g[k].shape == w[k].shape, k
            np.testing.assert_allclose(g[k], w[k], atol=2e-3, err_msg=k)


def test_fused_compact_to_contract():
    """compact_to in the fused program: same contract, mutual-consistent
    matches in the compacted output space."""
    img0, img1, H = _pair()
    m = FusedMatching({"fast_frontend": True, "compact_to": 192},
                      total_keypoints=256)
    pred = m(img0, img1)
    n0 = pred["keypoints0"].shape[1]
    assert 0 < n0 <= 192
    m0 = pred["matches0"][0]
    sel = m0 > -1
    assert np.all(pred["matches1"][0][m0[sel]] == np.nonzero(sel)[0])
    assert np.isfinite(pred["matching_scores0"]).all()


def test_fused_no_upsample_fo0():
    """firstOctave=0 operating point (upsample=False, the bench default on
    TPU): keypoint coordinates stay in input-image space, matches form on
    a rotated pair, and the homography is roughly satisfied by the
    mutual-consistency contract."""
    img0, img1, H = _pair(h=120, w=160)
    g0 = cv2.cvtColor(img0, cv2.COLOR_BGR2GRAY)
    g1 = cv2.cvtColor(img1, cv2.COLOR_BGR2GRAY)
    m = FusedMatching({
        "descriptor_source": "dense_gray",
        "upsample": False,
        "init_scheme": "identity",
    }, total_keypoints=256)
    pred = m(g0, g1)
    n0 = pred["keypoints0"].shape[1]
    assert n0 > 20
    kp = pred["keypoints0"][0]
    assert kp[:, 0].max() <= 160 and kp[:, 1].max() <= 120
    assert kp.min() >= 0
    m0 = pred["matches0"][0]
    sel = m0 > -1
    assert np.all(pred["matches1"][0][m0[sel]] == np.nonzero(sel)[0])
    # one octave fewer than the upsampled pyramid
    assert len(octave_budgets(120, 160, 256, upsample=False)) == \
        len(octave_budgets(120, 160, 256, upsample=True)) - 1


def test_fused_dense_layers_single_map():
    """dense_layers=(2,) runs the descriptor CNN once per octave; all
    keypoint layers sample that map — output contract unchanged."""
    img0, img1, _ = _pair(h=120, w=160)
    g0 = cv2.cvtColor(img0, cv2.COLOR_BGR2GRAY)
    g1 = cv2.cvtColor(img1, cv2.COLOR_BGR2GRAY)
    m = FusedMatching({
        "descriptor_source": "dense_gray",
        "upsample": False,
        "dense_layers": (2,),
        "init_scheme": "identity",
    }, total_keypoints=256)
    pred = m(g0, g1)
    assert pred["keypoints0"].shape[1] > 20
    assert np.isfinite(pred["matching_scores0"]).all()


def test_fused_tpu_knob_combination_on_cpu():
    """The shipped TPU auto-default knob set — bf16 attention, Pallas
    streaming Sinkhorn (interpret mode off-TPU), approx top-k/threshold,
    band AGC, centroid reconnect, kept-compaction — exercised end-to-end
    on the CPU suite (ADVICE r3: CPU parity tests previously never ran
    the TPU default combination). Matches must satisfy the contract and
    substantially agree with the exact/f32 CPU default."""
    img0, img1, _ = _pair(h=120, w=160)
    g0 = cv2.cvtColor(img0, cv2.COLOR_BGR2GRAY)
    g1 = cv2.cvtColor(img1, cv2.COLOR_BGR2GRAY)
    base = {
        "descriptor_source": "dense_gray",
        "upsample": False,
        "init_scheme": "identity",
    }
    tpu_combo = FusedMatching({
        **base,
        "attention_dtype": "bfloat16",
        "use_pallas_sinkhorn": True,
        "fast_frontend": True,
        "topk_impl": "approx",
        "threshold_impl": "approx",
        "agc_impl": "band",
        "band_halfwidth": 512,
        "reconnect_impl": "centroid",
        "reconnect_buckets": 1024,
        "compact_to": 192,
    }, total_keypoints=256)
    exact = FusedMatching({**base, "compact_to": 192}, total_keypoints=256)
    got = tpu_combo(g0, g1)
    want = exact(g0, g1)

    # contract: mutual consistency in the compacted space
    m0 = got["matches0"][0]
    sel = m0 > -1
    assert sel.sum() > 10
    assert np.all(got["matches1"][0][m0[sel]] == np.nonzero(sel)[0])
    assert np.isfinite(got["matching_scores0"]).all()

    # parity: the knob set trades exactness for speed, so require strong
    # (not bit) agreement on the matched coordinate pairs
    def match_set(pred):
        k0 = pred["keypoints0"][0]
        k1 = pred["keypoints1"][0]
        m = pred["matches0"][0]
        s = m > -1
        return {(round(float(a[0]), 1), round(float(a[1]), 1),
                 round(float(b[0]), 1), round(float(b[1]), 1))
                for a, b in zip(k0[s], k1[m[s]])}

    sa, sb = match_set(got), match_set(want)
    jac = len(sa & sb) / max(len(sa | sb), 1)
    assert jac > 0.6, f"TPU knob combo diverged from exact: jaccard={jac}"

    # the resolved config self-describes the combination
    rc = tpu_combo.resolved_config()
    assert rc["agc"]["agc_impl"] == "band"
    assert rc["matcher"]["use_pallas_sinkhorn"] is True
    assert rc["matcher"]["attention_dtype"] == "bfloat16"
