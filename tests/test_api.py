"""End-to-end API tests: the reference dict contract, match-index
consistency after compaction, and the GMatcher torch-checkpoint converter."""

import cv2
import numpy as np
import pytest
import jax

from gims_tpu.api import Matching, init_gmatcher_variables
from gims_tpu.config import MatcherConfig
from gims_tpu.matcher.convert import convert_gmatcher_torch


def synthetic_image(h=120, w=160, seed=0):
    rng = np.random.RandomState(seed)
    img = rng.randint(0, 255, (h // 4, w // 4, 3), np.uint8)
    img = cv2.resize(img, (w, h), interpolation=cv2.INTER_CUBIC)
    return cv2.GaussianBlur(img, (0, 0), 1.0)


@pytest.fixture(scope="module")
def matcher():
    return Matching({
        "sinkhorn_iterations": 10,
        "match_threshold": 0.02,
        "max_keypoints": -1,
    })


def test_end_to_end_contract(matcher):
    img0 = synthetic_image(seed=1)
    H = np.array([[1.0, 0.02, 4.0], [-0.01, 1.0, -3.0], [0, 0, 1.0]],
                 np.float32)
    img1 = cv2.warpPerspective(img0, H, (160, 120))
    pred = matcher({
        "image0": img0[None], "image1": img1[None],
        "radius": 30, "percentile": 5, "min_size": 3,
    })
    for key in ("keypoints0", "keypoints1", "matches0", "matches1",
                "matching_scores0", "matching_scores1",
                "descriptors0", "descriptors1", "mdesc0", "mdesc1"):
        assert key in pred, key
    n0 = pred["keypoints0"].shape[1]
    n1 = pred["keypoints1"].shape[1]
    assert n0 > 10 and n1 > 10
    assert pred["matches0"].shape == (1, n0)
    assert pred["matching_scores0"].shape == (1, n0)
    assert pred["descriptors0"].shape == (1, 256, n0)
    assert pred["mdesc0"].shape == (n0, 256)

    m0 = pred["matches0"][0]
    m1 = pred["matches1"][0]
    # matches index into the other (compacted) set and are mutually
    # consistent, like the reference's mutual-NN extraction
    valid = m0 > -1
    assert (m0[valid] < n1).all()
    for i in np.nonzero(valid)[0]:
        assert m1[m0[i]] == i
    # scores of matched keypoints exceed the threshold
    assert (pred["matching_scores0"][0][valid] > 0.02).all()


def test_keypoints_input_path(matcher):
    """Passing precomputed keypoints skips the frontend (reference:
    models/matching.py:17-24 behavior)."""
    rng = np.random.RandomState(0)
    n = 60
    kpts = rng.rand(n, 2).astype(np.float32) * 100
    descs = rng.randn(n, 256).astype(np.float32)
    scores = rng.rand(n).astype(np.float32)
    pred = matcher({
        "image0": synthetic_image(seed=2)[None],
        "image1": synthetic_image(seed=3)[None],
        "keypoints0": kpts, "descriptors0": descs, "scores0": scores,
        "keypoints1": kpts + 1.0, "descriptors1": descs, "scores1": scores,
        "radius": 50, "percentile": 10, "min_size": 2,
    })
    assert pred["keypoints0"].shape[1] <= n


def _torch_like_gmatcher_sd(rng, layers=4):
    sd = {}

    def conv1d(p, o, i):
        sd[f"{p}.weight"] = rng.randn(o, i, 1).astype(np.float32) * 0.05
        sd[f"{p}.bias"] = np.zeros(o, np.float32)

    def bn(p, c):
        sd[f"{p}.weight"] = np.ones(c, np.float32)
        sd[f"{p}.bias"] = np.zeros(c, np.float32)
        sd[f"{p}.running_mean"] = np.zeros(c, np.float32)
        sd[f"{p}.running_var"] = np.ones(c, np.float32)
        sd[f"{p}.num_batches_tracked"] = np.array(1)

    # kenc: channels [2, 32, 64, 128, 256, 256]
    dims = [2, 32, 64, 128, 256, 256]
    for i in range(5):
        conv1d(f"kenc.encoder.{3 * i}", dims[i + 1], dims[i])
        if i < 4:
            bn(f"kenc.encoder.{3 * i + 1}", dims[i + 1])
    for l in range(layers):
        for j in range(3):
            conv1d(f"gnn.layers.{l}.attn.proj.{j}", 256, 256)
        conv1d(f"gnn.layers.{l}.attn.merge", 256, 256)
        conv1d(f"gnn.layers.{l}.mlp.0", 512, 512)
        bn(f"gnn.layers.{l}.mlp.1", 512)
        conv1d(f"gnn.layers.{l}.mlp.3", 256, 512)
    sage_dims = [(256, 128), (128, 128), (128, 256)]
    for i, (cin, cout) in enumerate(sage_dims):
        sd[f"gnn_encoder.layers.{i}.fc_self.weight"] = (
            rng.randn(cout, cin).astype(np.float32) * 0.05
        )
        sd[f"gnn_encoder.layers.{i}.fc_neigh.weight"] = (
            rng.randn(cout, cin).astype(np.float32) * 0.05
        )
        sd[f"gnn_encoder.layers.{i}.bias"] = np.zeros(cout, np.float32)
    conv1d("final_proj", 256, 256)
    sd["bin_score"] = np.array(1.0, np.float32)
    return sd


def test_gmatcher_converter_tree(rng):
    layers = 4
    sd = _torch_like_gmatcher_sd(rng, layers=layers)
    converted = convert_gmatcher_torch(sd, num_gnn_layers=layers)
    mcfg = MatcherConfig(num_gnn_layers=layers)
    ref = init_gmatcher_variables(mcfg)

    def shapes(tree):
        return jax.tree_util.tree_map(lambda a: tuple(np.asarray(a).shape), tree)

    assert shapes(ref["params"]) == shapes(converted["params"])
    assert shapes(ref["batch_stats"]) == shapes(converted["batch_stats"])


def test_weights_path_torch_checkpoint(tmp_path, rng):
    """Matching({'weights_path': ...}) must load a reference-layout torch
    checkpoint end to end (EMA preferred, like gmatcher.py:208-217)."""
    import torch

    layers = 4
    sd = _torch_like_gmatcher_sd(rng, layers=layers)
    tsd = {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}
    ckpt = {"epoch": 1, "iter": 5, "ema": tsd, "model": None,
            "optimizer": {}}
    path = tmp_path / "gims_ckpt.pt"
    torch.save(ckpt, path)

    from gims_tpu.matcher.convert import load_gims_checkpoint

    variables = load_gims_checkpoint(str(path), num_gnn_layers=layers)
    assert "params" in variables and "batch_stats" in variables
    assert float(np.asarray(variables["params"]["bin_score"])) == 1.0

    # and it actually runs through the matcher
    from gims_tpu.api import Matching
    from gims_tpu.config import GIMSConfig, MatcherConfig, AGCConfig

    cfg = GIMSConfig(
        matcher=MatcherConfig(num_gnn_layers=layers, sinkhorn_iterations=5,
                              match_threshold=0.02),
        agc=AGCConfig(radius=30.0, percentile=5.0, min_size=3),
    )
    m = Matching(cfg, variables=variables)
    img = synthetic_image(seed=9)
    pred = m({"image0": img[None], "image1": img[None]})
    assert pred["matches0"].shape[1] == pred["keypoints0"].shape[1]


def test_delaunay_path(matcher):
    """D-GIMS variant: Delaunay adjacency, all nodes kept (the reference's
    Delaunay inference crashes with a NameError; fixed here)."""
    img0 = synthetic_image(seed=4)
    H = np.array([[1.0, 0.0, 3.0], [0.0, 1.0, -2.0], [0, 0, 1.0]], np.float32)
    img1 = cv2.warpPerspective(img0, H, (160, 120))
    pred = matcher({
        "image0": img0[None], "image1": img1[None], "delaunay": True,
    })
    n0 = pred["keypoints0"].shape[1]
    assert n0 > 10
    # Delaunay keeps every keypoint (no pruning)
    assert pred["matches0"].shape == (1, n0)


def test_prepare_features_pipelining(matcher):
    """prepare_features (threaded per-side frontend) must produce the same
    predictions as the direct image path."""
    img0 = synthetic_image(seed=4)
    H = np.array([[1.0, 0.01, 2.0], [-0.02, 1.0, 1.0], [0, 0, 1.0]],
                 np.float32)
    img1 = cv2.warpPerspective(img0, H, (160, 120))
    agc = {"radius": 30, "percentile": 5, "min_size": 3}
    direct = matcher({"image0": img0[None], "image1": img1[None], **agc})
    feats = matcher.prepare_features((img0, img1), agc)
    piped = matcher({"image0": img0[None], "image1": img1[None],
                     "features": feats, **agc})
    np.testing.assert_array_equal(direct["matches0"], piped["matches0"])
    np.testing.assert_array_equal(direct["keypoints0"], piped["keypoints0"])
    np.testing.assert_allclose(
        direct["matching_scores0"], piped["matching_scores0"],
        rtol=1e-6, atol=1e-6,
    )


def test_weights_path_npz(tmp_path):
    """weights_path also accepts this framework's native .npz export."""
    from gims_tpu.core.checkpoint import save_npz
    from gims_tpu.config import MatcherConfig

    variables = init_gmatcher_variables(MatcherConfig(), seed=3)
    p = str(tmp_path / "w.npz")
    save_npz(p, variables)
    m = Matching({"weights_path": p, "sinkhorn_iterations": 5})
    leaf = m.variables["params"]["final_proj"]["kernel"]
    want = variables["params"]["final_proj"]["kernel"]
    np.testing.assert_allclose(np.asarray(leaf), np.asarray(want))
