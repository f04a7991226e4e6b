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
    # Best effort: on a standard jax build this selects an 8-device virtual
    # CPU platform. NOTE: this environment's axon jax plugin reads platform
    # selection only from the env at interpreter start, so under it these
    # lines are a no-op and the suite runs against the real device (still
    # green, just slower); mesh-dependent tests skip unless the env is set
    # in the shell:
    #   JAX_PLATFORM_NAME=cpu JAX_PLATFORMS=cpu \
    #   XLA_FLAGS=--xla_force_host_platform_device_count=8 pytest tests/
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import pytest  # noqa: E402


def _enable_compile_cache() -> None:
    """XLA-CPU compiles are slow in this sandbox; cache them across runs."""
    import jax

    cache_dir = os.path.join(os.path.dirname(__file__), os.pardir, ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", os.path.abspath(cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


_enable_compile_cache()


@pytest.fixture(scope="session")
def rng():
    import numpy as np

    return np.random.default_rng(1234)
