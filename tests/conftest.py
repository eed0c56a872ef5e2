"""Test harness: force an 8-device virtual CPU mesh so the parallelism layer
is exercised without TPU hardware (the standard JAX fake-cluster substitute,
SURVEY.md §4)."""

import os

# Hard override: the driver environment registers a tunneled-TPU backend via
# sitecustomize and pins jax_platforms to it; unit tests must run on the
# local virtual-8-device CPU mesh. The env var alone is NOT enough (the
# plugin's register() overwrites jax_platforms), so also update jax.config
# before any backend is initialized.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
