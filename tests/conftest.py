"""Test configuration: CPU backend, 8 virtual devices, float64 enabled.

Tests verify numerical contracts against the reference golden vectors in
double precision on the CPU backend; TPU parity is checked by the bench and
the driver's compile checks.

Note: the session environment pins JAX_PLATFORMS=axon (remote TPU) and a
sitecustomize imports jax at interpreter startup, so the platform must be
overridden via jax.config (not os.environ) before the first backend use.
"""

import os

# XLA reads XLA_FLAGS at backend-client creation, which has not happened yet.
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import pathlib  # noqa: E402

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE = pathlib.Path("/root/reference")


@pytest.fixture(scope="session")
def ref_test_dir():
    return REFERENCE / "test"


@pytest.fixture(scope="session")
def capbuf_0000():
    from lte_cell_scanner_tpu.utils import read_itfile
    d = read_itfile(str(REFERENCE / "test" / "capbuf_0000.it"))
    return d["capbuf"], float(d["fc"][0])
