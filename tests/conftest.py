"""Test configuration.

Solver math is validated on CPU in float64 (the reference C solver is
all-double); sharding tests use a virtual 8-device CPU mesh via
``xla_force_host_platform_device_count`` as recommended for multi-chip
designs without multi-chip hardware.
"""

import os

# The environment pins JAX_PLATFORMS=axon (TPU tunnel) and the axon
# sitecustomize re-registers the platform at import, overriding the env var;
# unit tests must run on the virtual CPU mesh, so override the jax config
# directly after import.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import pathlib  # noqa: E402

import pytest  # noqa: E402

REFERENCE_DATA = pathlib.Path("/root/reference/lorads/data")


@pytest.fixture(scope="session")
def g11_path():
    p = REFERENCE_DATA / "Max_cut_SDP" / "G11.dat-s"
    if not p.exists():
        pytest.skip("G11.dat-s not available")
    return str(p)


@pytest.fixture(scope="session")
def theta102_path():
    p = REFERENCE_DATA / "General_SDP" / "theta102.dat-s"
    if not p.exists():
        pytest.skip("theta102.dat-s not available")
    return str(p)


@pytest.fixture(scope="session")
def mc500_path():
    p = REFERENCE_DATA / "Matrix_Completion_SDP" / "MC_500.dat-s"
    if not p.exists():
        pytest.skip("MC_500.dat-s not available")
    return str(p)
