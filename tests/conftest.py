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
