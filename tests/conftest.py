"""Test configuration.

Tests run on CPU with 8 virtual devices so that sharding paths are exercised
without TPU hardware (the standard JAX trick; see SURVEY.md §4). This must
happen before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# The environment's sitecustomize may have imported jax already (locking in a
# TPU platform from the env); jax.config.update still works pre-backend-init.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
