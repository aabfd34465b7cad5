"""Tools + serving-wrapper tests (tiny images, CPU)."""

import os

import cv2
import numpy as np
import pytest

from gims_tpu.config import GIMSConfig, AGCConfig, MatcherConfig


def synthetic_image(h=120, w=160, seed=0):
    rng = np.random.RandomState(seed)
    img = rng.randint(0, 255, (h // 4, w // 4, 3), np.uint8)
    img = cv2.resize(img, (w, h), interpolation=cv2.INTER_CUBIC)
    return cv2.GaussianBlur(img, (0, 0), 1.0)


@pytest.fixture(scope="module")
def tiny_matcher():
    from gims_tpu.api import Matching

    return Matching(GIMSConfig(
        matcher=MatcherConfig(sinkhorn_iterations=5, match_threshold=0.02,
                              num_gnn_layers=4),
        agc=AGCConfig(radius=30.0, percentile=5.0, min_size=3),
    ))


def test_parameter_search(tmp_path, tiny_matcher):
    from gims_tpu.tools.parameter_search import search

    img0 = synthetic_image(seed=1)
    H = np.array([[1.0, 0.02, 4.0], [-0.01, 1.0, -3.0], [0, 0, 1.0]],
                 np.float32)
    img1 = cv2.warpPerspective(img0, H, (160, 120))
    p0 = tmp_path / "a.png"
    p1 = tmp_path / "b.png"
    cv2.imwrite(str(p0), img0)
    cv2.imwrite(str(p1), img1)
    rows = search(str(p0), str(p1), [[30, 5, 3], [40, 5, 2]], None,
                  str(tmp_path / "out"), matcher=tiny_matcher)
    assert len(rows) == 2
    for r in rows:
        assert len(r) == 6
    rec_dir = tmp_path / "out" / "a_b"
    assert (rec_dir / "record.txt").exists()
    # xlsx when openpyxl is present, csv fallback otherwise
    assert (rec_dir / "record.xlsx").exists() or (rec_dir / "record.csv").exists()


def test_parameter_visualize(tmp_path):
    from gims_tpu.tools.parameter_visualize import render_report, load_records

    rec = tmp_path / "record.txt"
    rng = np.random.RandomState(0)
    with open(rec, "w") as f:
        for r in range(10, 13):
            for t in range(0, 3):
                for m in range(0, 3):
                    f.write(f"[{r}, {t}, {m}, {rng.randint(100)}, 500, "
                            f"{rng.rand():.3f}]\n")
    arr = load_records(rec)
    assert arr.shape == (27, 6)
    out = render_report([str(rec)], str(tmp_path / "report.html"))
    html = open(out).read()
    assert "base64" in html and "sweep" in html


def test_parameter_visualize_interactive(tmp_path):
    from gims_tpu.tools.parameter_visualize import (
        render_interactive,
        load_records,
    )

    rec = tmp_path / "record.txt"
    rng = np.random.RandomState(0)
    with open(rec, "w") as f:
        for r in range(10, 13):
            for t in range(0, 3):
                for m in range(0, 3):
                    f.write(f"[{r}, {t}, {m}, {rng.randint(100)}, 500, "
                            f"{rng.rand():.3f}]\n")
    out = render_interactive([str(rec)], str(tmp_path / "dash.html"),
                             password="pw")
    html = open(out).read()
    # embedded data + the client-side controls the Dash app provided
    assert '"pw"' in html
    arr = load_records(rec)
    assert f"[{arr[0, 0]:g}" in html.replace(".0,", ",") or "DATA" in html
    for control in ("scene", "metric", "fixaxis", "fixval", "hm", "tbl"):
        assert f'id="{control}"' in html, control


def test_image_viewer_headless(tmp_path):
    from gims_tpu.tools.image_viewer import run_headless

    for folder in ("f1", "f2"):
        os.makedirs(tmp_path / folder)
        cv2.imwrite(str(tmp_path / folder / "x.png"),
                    synthetic_image(seed=hash(folder) % 100))
    run_headless([str(tmp_path / "f1"), str(tmp_path / "f2")],
                 str(tmp_path / "out"))
    assert (tmp_path / "out" / "x.png").exists()
    grid = cv2.imread(str(tmp_path / "out" / "x.png"))
    assert grid.shape == (720, 960, 3)


def test_find_matches_surface(tiny_matcher):
    from gims_tpu.cli.serve_cli import find_matches

    img0 = synthetic_image(seed=3)
    H = np.array([[1.0, 0.0, 2.0], [0.0, 1.0, -2.0], [0, 0, 1.0]], np.float32)
    img1 = cv2.warpPerspective(img0, H, (160, 120))
    viz, details = find_matches(
        tiny_matcher, img0, img1, resize_enabled=False,
        agc={"radius": 30, "percentile": 5, "min_size": 3},
    )
    assert viz.shape == (120, 320, 3)
    assert set(details) >= {"keypoints0", "keypoints1", "matches", "seconds"}


def test_find_matches_fused_surface():
    from gims_tpu.cli.serve_cli import find_matches
    from gims_tpu.fused import FusedMatching

    img0 = synthetic_image(seed=3)
    H = np.array([[1.0, 0.0, 2.0], [0.0, 1.0, -2.0], [0, 0, 1.0]], np.float32)
    img1 = cv2.warpPerspective(img0, H, (160, 120))
    matcher = FusedMatching({"fast_frontend": True}, total_keypoints=256)
    viz, details = find_matches(matcher, img0, img1, resize_enabled=False)
    assert viz.shape == (120, 320, 3)
    assert set(details) >= {"keypoints0", "keypoints1", "matches", "seconds"}


def test_match_eval_cli(tmp_path, tiny_matcher):
    from gims_tpu.eval.matches import run_match_eval

    img0 = synthetic_image(seed=5)
    img1 = synthetic_image(seed=5)  # same content, near-identity match
    p0 = tmp_path / "i1.png"
    p1 = tmp_path / "i2.png"
    cv2.imwrite(str(p0), img0)
    cv2.imwrite(str(p1), cv2.warpAffine(
        img1, np.float32([[1, 0, 3], [0, 1, -2]]), (160, 120)))
    results = run_match_eval(
        str(p0), str(p1), root_path=str(tmp_path / "out"),
        matcher=tiny_matcher,
        agc={"radius": 30, "percentile": 5, "min_size": 3},
    )
    assert len(results) == 1
    assert (tmp_path / "out" / "gims" / "result.txt").exists()
