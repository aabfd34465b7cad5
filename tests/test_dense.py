"""Dense convolutional descriptor path: bf16 speed-mode parity and the
trimmed-pyramid fused extraction (reference capability replaced:
utils/library.py:84-110 ComputePatches + carhynet/models.py:655-665)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gims_tpu.carhynet.engine import DescriptorEngine
from gims_tpu.carhynet.model import CARHyNet
from gims_tpu.config import FrontendConfig
from gims_tpu import fused


def _img(h=120, w=160, seed=0):
    rng = np.random.RandomState(seed)
    import cv2

    img = rng.randint(0, 255, (h // 4, w // 4, 3)).astype("uint8")
    img = cv2.resize(img, (w, h), interpolation=cv2.INTER_CUBIC)
    return cv2.GaussianBlur(img, (0, 0), 1.2)


def test_dense_bf16_matches_f32():
    eng = DescriptorEngine(seed=0)
    model = CARHyNet(dense=True)
    rng = np.random.RandomState(1)
    levels = jnp.asarray(rng.rand(3, 64, 80, 3).astype(np.float32))

    f32 = model.apply(eng.variables, levels, train=False)
    bf16_vars = jax.tree_util.tree_map(
        lambda p: p.astype(jnp.bfloat16)
        if jnp.issubdtype(p.dtype, jnp.floating) else p,
        eng.variables,
    )
    half = model.apply(bf16_vars, levels.astype(jnp.bfloat16), train=False)
    assert half.dtype == jnp.float32  # dense head normalizes in f32
    a = np.asarray(f32).reshape(-1, 128)
    b = np.asarray(half).reshape(-1, 128)
    cos = np.sum(a * b, axis=-1)  # both L2-normalized
    assert float(np.mean(cos)) > 0.995
    assert float(np.min(cos)) > 0.97


@pytest.mark.parametrize("dense_dtype", ["float32", "bfloat16"])
def test_fused_extract_dense(dense_dtype):
    img = _img()
    h, w = img.shape[:2]
    eng = DescriptorEngine(seed=0)
    fe = FrontendConfig(interpolation="linear", warp_size=32,
                        descriptor_source="dense", dense_dtype=dense_dtype)
    budgets = fused.octave_budgets(h, w, 512)
    kp, sc, va, de = fused._extract_side(
        jnp.asarray(img), h, w, budgets, fe, eng.variables,
        CARHyNet(), CARHyNet(dense=True),
    )
    n = int(np.sum(np.asarray(va)))
    assert n > 16
    de = np.asarray(de)
    # valid rows are duplicated 128->256 and unit-normalized per half
    norms = np.linalg.norm(de[np.asarray(va)][:, :128], axis=-1)
    assert np.allclose(norms, 1.0, atol=1e-2)
    assert np.allclose(de[~np.asarray(va)], 0.0)


def test_fused_extract_dense_gray():
    """dense_gray: gray-pyramid descriptors, no color pyramid, octave-0
    keypoints sampled from octave 1."""
    img = _img(seed=5)
    h, w = img.shape[:2]
    model = CARHyNet(in_channels=1)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 32, 32, 1), jnp.float32))
    fe = FrontendConfig(interpolation="linear", warp_size=32,
                        descriptor_source="dense_gray",
                        dense_dtype="float32")
    budgets = fused.octave_budgets(h, w, 512)
    for image in (img, np.ascontiguousarray(img[..., 0])):  # color & gray in
        kp, sc, va, de = fused._extract_side(
            jnp.asarray(image), h, w, budgets, fe, variables,
            model, CARHyNet(dense=True, in_channels=1),
        )
        n = int(np.sum(np.asarray(va)))
        assert n > 16
        de = np.asarray(de)
        norms = np.linalg.norm(de[np.asarray(va)][:, :128], axis=-1)
        assert np.allclose(norms, 1.0, atol=1e-2)


def test_dense_gray_host_frontend_octave0_equals_octave1():
    """o_idx=0 keypoints sample octave 1 at the SAME map location as an
    o_idx=1 keypoint at the same image point (p_src = pt * 2^(1-src))."""
    from gims_tpu.frontend.dense import DenseGrayDescriptorFrontend
    from gims_tpu.frontend.sift import KeypointArrays

    img = _img(seed=7)
    model = CARHyNet(in_channels=1)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 32, 32, 1), jnp.float32))
    fr = DenseGrayDescriptorFrontend(variables, dtype="float32")
    pts = np.array([[40.0, 30.0], [81.5, 62.25]], np.float32)

    def kparr(o):
        n = len(pts)
        return KeypointArrays(
            pt=pts.copy(),
            size=np.full(n, 3.2, np.float32),
            angle=np.zeros(n, np.float32),
            response=np.ones(n, np.float32),
            octave=np.full(n, o, np.int32),
            layer=np.ones(n, np.int32),
            scale=np.full(n, float(2.0 ** (1 - (o + 1))), np.float32),
        )

    d_oct_m1 = np.asarray(fr.compute(img, kparr(-1), 2))  # o_idx 0
    d_oct_0 = np.asarray(fr.compute(img, kparr(0), 2))    # o_idx 1
    np.testing.assert_allclose(d_oct_m1, d_oct_0, atol=1e-5)


def test_fused_matching_dense_gray_contract():
    """FusedMatching end-to-end with dense_gray on single-channel input."""
    from gims_tpu.fused import FusedMatching
    import cv2

    img0 = _img(seed=11, h=96, w=128)
    M = cv2.getRotationMatrix2D((64, 48), 8, 0.97)
    H = np.eye(3, dtype=np.float32)
    H[:2] = M
    img1 = cv2.warpPerspective(img0, H, (128, 96))
    g0 = cv2.cvtColor(img0, cv2.COLOR_BGR2GRAY)
    g1 = cv2.cvtColor(img1, cv2.COLOR_BGR2GRAY)

    m = FusedMatching({"fast_frontend": True,
                       "descriptor_source": "dense_gray",
                       "init_scheme": "identity"}, total_keypoints=256)
    pred = m(g0, g1)
    n0 = pred["keypoints0"].shape[1]
    assert n0 > 30
    assert pred["matches0"].shape == (1, n0)
    m0 = pred["matches0"][0]
    sel = m0 > -1
    assert np.all(pred["matches1"][0][m0[sel]] == np.nonzero(sel)[0])
    assert np.isfinite(pred["matching_scores0"]).all()


def test_fused_extract_dense_agrees_across_dtypes():
    img = _img(seed=3)
    h, w = img.shape[:2]
    eng = DescriptorEngine(seed=0)
    budgets = fused.octave_budgets(h, w, 512)
    outs = {}
    for dd in ("float32", "bfloat16"):
        fe = FrontendConfig(interpolation="linear", warp_size=32,
                            descriptor_source="dense", dense_dtype=dd)
        kp, sc, va, de = fused._extract_side(
            jnp.asarray(img), h, w, budgets, fe, eng.variables,
            CARHyNet(), CARHyNet(dense=True),
        )
        outs[dd] = (np.asarray(kp), np.asarray(va), np.asarray(de))
    kp0, va0, de0 = outs["float32"]
    kp1, va1, de1 = outs["bfloat16"]
    np.testing.assert_array_equal(va0, va1)  # detection is dtype-independent
    np.testing.assert_allclose(kp0[va0], kp1[va1], atol=1e-4)
    cos = np.sum(de0[va0][:, :128] * de1[va1][:, :128], axis=-1)
    assert float(np.mean(cos)) > 0.995
