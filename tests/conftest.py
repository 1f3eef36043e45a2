"""Test harness configuration.

Tests run on a *virtual 8-device CPU mesh* (the standard JAX trick for
exercising multi-chip sharding semantics without hardware).  Env vars must
be set before JAX initializes its backends; additionally the axon TPU
plugin (sitecustomize) force-selects its platform, so we override it via
`jax.config` at import time — conftest is imported by pytest before any test
module touches jax.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
