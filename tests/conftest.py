"""Test harness configuration.

Tests run on a *virtual 8-device CPU mesh* (the standard JAX trick for
exercising multi-chip sharding semantics without hardware).  Env vars must
be set before JAX initializes its backends; additionally the axon TPU
plugin (sitecustomize) force-selects its platform, so we override it via
`jax.config` at import time — conftest is imported by pytest before any test
module touches jax.
"""

import os

# LDM_TESTS_ON_TPU=1 skips the CPU forcing so selected single-device
# tests (e.g. the golden/pipeline parity suite — the north-star pixel
# check) can run against the real chip:
#   LDM_TESTS_ON_TPU=1 pytest tests/test_pipeline_parity.py -q
# Mesh-dependent tests assume 8 devices and will fail on one chip; run
# them on the default CPU harness.
_ON_TPU = os.environ.get("LDM_TESTS_ON_TPU") == "1"

_flags = os.environ.get("XLA_FLAGS", "")
if not _ON_TPU and "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
if not _ON_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

if not _ON_TPU:
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
