"""Test configuration: force CPU with 8 virtual devices.

This is the TPU analog of the reference's fake AO environment
(``/root/reference/tests/tfhe.test.js:13-25``): same code, fake device farm.
Sharding tests use the 8 virtual CPU devices
(``xla_force_host_platform_device_count``, SURVEY.md §4).
"""

import os

# Force-override: the ambient environment pins JAX_PLATFORMS to the TPU
# tunnel; unit tests must run on the virtual CPU device farm. Set
# EOC_TESTS_TPU=1 to run on the attached TPU instead (e.g. for the Mosaic
# compile tests), at the cost of the 8-virtual-device sharding tests.
if not os.environ.get("EOC_TESTS_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    # The axon sitecustomize imports jax at interpreter start (before this
    # conftest), so the env vars above are too late for jax's config import;
    # override through the live config instead. Backends have not been
    # initialized yet at collection time, so both settings still take effect.
    import jax

    jax.config.update("jax_platforms", "cpu")

import sys

import numpy as np
import pytest

# Make sibling test helpers (oracle.py) importable regardless of rootdir.
sys.path.insert(0, os.path.dirname(__file__))


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running 128-bit end-to-end tests (kept in CI)")


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
