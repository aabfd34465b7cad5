"""Eval harness + training loop smoke tests (tiny configs, CPU)."""

import dataclasses
import os

import numpy as np
import pytest

from gims_tpu.config import (
    GIMSConfig, AGCConfig, MatcherConfig, DatasetConfig, TrainConfig,
    FrontendConfig,
)
from gims_tpu.eval import metrics as M


def test_pose_auc_manual():
    errors = [1.0, 2.0, 6.0]
    aucs = M.pose_auc(errors, [5])
    # recall steps: 1/3 at e=1, 2/3 at e=2; flat to t=5
    # area = .5*(1*1/3)... trapezoid over [0,1,2,5]
    want = (0.5 * 1 * (1 / 3) + 0.5 * (1 / 3 + 2 / 3) * 1 + 3 * (2 / 3)) / 5
    np.testing.assert_allclose(aucs[0], want, rtol=1e-9)


def test_weighted_score():
    results = {
        "dlt_auc": [1.0, 2.0, 3.0], "ransac_auc": [4.0, 5.0, 6.0],
        "precision": 7.0, "recall": 8.0,
    }
    want = 0.1 * 2 + 0.2 * 3 + 0.1 * 4 + 0.2 * 5 + 0.2 * 6 + 0.1 * 7 + 0.1 * 8
    np.testing.assert_allclose(M.weighted_score(results), want)


@pytest.fixture(scope="module")
def tiny_cfg():
    return GIMSConfig(
        matcher=MatcherConfig(
            sinkhorn_iterations=5, match_threshold=0.02, num_gnn_layers=4,
        ),
        agc=AGCConfig(radius=30.0, percentile=5.0, min_size=3),
        dataset=DatasetConfig(image_height=120, image_width=160,
                              apply_color_aug=False),
        train=TrainConfig(
            batch_size=1, num_epochs=1, val_images_count=2,
            max_keypoints=256, log_interval=1, minloss_every=1,
            lastiter_every=2,
        ),
    )


def test_benchmark_harness(tmp_path, tiny_cfg):
    from gims_tpu.eval.homography import generate_benchmark, run_benchmark
    from gims_tpu.api import Matching

    txt, images = generate_benchmark(str(tmp_path / "bench"), n_pairs=3,
                                     height=120, width=160)
    matcher = Matching(tiny_cfg)
    results = run_benchmark(
        txt, images, str(tmp_path / "out"), matcher=matcher,
        resize=(160, 120), min_matches=4,
        agc={"radius": 30, "percentile": 5, "min_size": 3},
    )
    # artifacts written for each pair
    outs = os.listdir(tmp_path / "out")
    assert sum(f.endswith("_matches.npz") for f in outs) == 3
    assert sum(f.endswith("_evaluation.npz") for f in outs) == 3
    assert (tmp_path / "out" / "result" / "results.txt").exists()
    if results is not None:
        assert set(results) >= {"dlt_auc", "ransac_auc", "precision",
                                "recall", "weight_score"}


def test_train_loop_smoke(tmp_path, tiny_cfg):
    from gims_tpu.train.loop import train, restore_train_state
    from gims_tpu.train.data import SyntheticPairDataset

    ds = SyntheticPairDataset(tiny_cfg.dataset, length=2, seed=0)
    val = SyntheticPairDataset(tiny_cfg.dataset, length=2, seed=1)
    logs = []
    state = train(
        tiny_cfg, train_dataset=ds, val_dataset=val,
        save_dir=str(tmp_path / "run"), max_steps=2,
        log_fn=lambda *a: logs.append(" ".join(map(str, a))),
    )
    assert int(state.step) == 2
    weights = os.listdir(tmp_path / "run" / "weights")
    assert "last" in weights
    assert "minloss" in weights
    # "best" appears only when validation beats the initial score — with
    # random weights all val pairs are skipped (score 0), like the reference
    assert (tmp_path / "run" / "results.txt").exists()

    # real resume (the reference's restore_path was dead code)
    state2, tx, epoch, it = restore_train_state(
        tiny_cfg, str(tmp_path / "run" / "weights" / "last"), num_batches=2
    )
    assert int(state2.step) == 2
    a = np.asarray(
        __import__("jax").tree_util.tree_leaves(state.params)[0]
    )
    b = np.asarray(
        __import__("jax").tree_util.tree_leaves(state2.params)[0]
    )
    np.testing.assert_array_equal(a, b)


def test_train_kill_and_resume(tmp_path, tiny_cfg):
    """Train one epoch, 'kill', resume via restore_path: the second run
    must pick up the optimizer step and epoch counters and keep training
    (fixes the reference's dead restore_path, train.py:40)."""
    import jax

    from gims_tpu.train.loop import train
    from gims_tpu.train.data import SyntheticPairDataset

    ds = SyntheticPairDataset(tiny_cfg.dataset, length=2, seed=0)
    val = SyntheticPairDataset(tiny_cfg.dataset, length=2, seed=1)
    state_a = train(
        tiny_cfg, train_dataset=ds, val_dataset=val,
        save_dir=str(tmp_path / "runA"), log_fn=lambda *a: None,
    )
    assert int(state_a.step) == 2  # epoch 0 complete (2 batches)

    cfg2 = dataclasses.replace(
        tiny_cfg, train=dataclasses.replace(tiny_cfg.train, num_epochs=2)
    )
    logs = []
    state_b = train(
        cfg2, train_dataset=ds, val_dataset=val,
        save_dir=str(tmp_path / "runB"),
        restore_path=str(tmp_path / "runA" / "weights" / "last"),
        log_fn=lambda *a: logs.append(" ".join(map(str, a))),
    )
    assert any("resumed" in l for l in logs)
    # "last" was an end-of-epoch-0 ckpt (iter=-1) -> resume at epoch 1,
    # exactly one more epoch of 2 steps
    assert int(state_b.step) == 4
    assert any(l.strip().startswith("1 ") or "%10s" % "1" in l
               for l in logs if "resumed" not in l)
    # params kept training from the restored point
    pa = jax.tree_util.tree_leaves(state_a.params)
    pb = jax.tree_util.tree_leaves(state_b.params)
    assert max(
        float(np.abs(np.asarray(x) - np.asarray(y)).max())
        for x, y in zip(pa, pb)
    ) > 0
