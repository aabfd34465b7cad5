"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Must set env vars before the first `import jax` anywhere in the test
process (SURVEY.md §4: CPU multi-device simulation stands in for a TPU pod
slice in CI).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The environment's sitecustomize may import jax (and pin JAX_PLATFORMS)
# before this conftest runs, so the env var alone is not enough — override
# the already-materialized config as well.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)


# ---------------------------------------------------------------------------
# Smoke tier: `pytest tests/ -m smoke` runs one fast test per subsystem
# (< 5 min on this host's single core) — the pre-commit gate; the full
# suite is the nightly/CI gate (scripts/run_tests.sh).
# ---------------------------------------------------------------------------

SMOKE = {
    "test_agc.py::test_agc_parity_eval_knobs",
    "test_agc.py::test_agc_band_parity_eval_knobs",
    "test_api.py::test_end_to_end_contract",
    "test_blurmat.py::test_band_matrix_columns_sum_to_one",
    "test_carhynet.py::test_frn_formula",
    "test_dense.py::test_fused_extract_dense_gray",
    "test_detect_device.py::test_device_detect_flat_image_empty",
    "test_frontend.py::test_full_frontend_extract",
    "test_fused.py::test_octave_budgets_sum_and_caps",
    "test_hynet_loss.py::test_fpr95",
    "test_matcher.py::test_normalize_keypoints_modes",
    "test_native.py::test_knn_matcher_vs_numpy",
    "test_sinkhorn.py::test_unpadded_matches_oracle",
    "test_sift_descriptor.py::test_describe_value_range",
    "test_sharded.py::test_sharded_matches_dense",
    "test_tools.py::test_image_viewer_headless",
    "test_train.py::test_lr_schedule_parity",
    "test_train.py::test_single_device_train_step",
    "test_eval_loop.py::test_pose_auc_manual",
    "test_utils_extra.py::test_estimate_pose_roundtrip",
}


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "smoke: fast per-subsystem gate (pytest -m smoke)")


def pytest_collection_modifyitems(config, items):
    for item in items:
        key = f"{item.fspath.basename}::{item.name.split('[')[0]}"
        if key in SMOKE:
            item.add_marker(pytest.mark.smoke)
