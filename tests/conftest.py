"""Test harness configuration.

Tests run on a *virtual 8-device CPU mesh* (the standard JAX trick for
exercising multi-chip sharding semantics without hardware): the env vars must
be set before `import jax` anywhere, hence they live at the very top of
conftest.py, which pytest imports first.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
