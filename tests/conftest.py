"""Test configuration.

By default the suite runs on a virtual 8-device CPU mesh so that multi-chip
sharding is exercised without TPU hardware (the driver validates the real
multi-chip path separately via __graft_entry__.dryrun_multichip). Set
HVD_TEST_PLATFORM=tpu to run the same suite against the real chip.

These env vars must be set before jax is imported, hence the top of conftest.
"""

from __future__ import annotations

import os

_platform = os.environ.get("HVD_TEST_PLATFORM", "cpu")
if _platform == "cpu":
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    import numpy as np

    return np.random.default_rng(1234)
