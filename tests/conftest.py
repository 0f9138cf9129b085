"""Test configuration.

Tests run on a virtual 8-device CPU mesh (the standard JAX pattern for
exercising multi-chip sharding without a TPU slice).  The env vars must be
set before jax initializes its backends, hence the import-time side effect.
"""

import os

# Force the CPU backend even when a TPU plugin (e.g. the axon tunnel) has
# pre-set JAX_PLATFORMS: the config.update below wins over the env var.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(31415)


@pytest.fixture(scope="session")
def fixtures_dir():
    import pathlib

    return pathlib.Path(__file__).parent / "goldens"
