"""Test harness: force an 8-device virtual CPU mesh.

The reference validated multi-GPU behavior only by running real jobs
(SURVEY.md §4); our analog is JAX's virtual-device CPU backend.  Tests run on
8 virtual CPU devices so every sharding/collective path executes for real —
`jax.config.update` must happen before any backend use, hence this conftest
imports jax first.
"""

import os

os.environ.setdefault(
    "XLA_FLAGS",
    "--xla_force_host_platform_device_count=8",
)
if "--xla_force_host_platform_device_count" not in os.environ["XLA_FLAGS"]:
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

if os.environ.get("MMU_TPU_TESTS") != "1":
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)


@pytest.fixture(scope="session", autouse=True)
def _check_devices():
    if os.environ.get("MMU_TPU_TESTS") != "1":
        assert jax.default_backend() == "cpu"
