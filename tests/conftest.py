"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; sharding tests use
``xla_force_host_platform_device_count`` which is the reference-free
substitute for the reference's (absent) multi-GPU testing (SURVEY.md §4).

Must run before jax initializes a backend, hence env vars at import time.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # override any pre-set platform (axon)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# jax may have been imported (and read JAX_PLATFORMS) by a pytest plugin
# before this conftest ran; force the config directly as well.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(2)
