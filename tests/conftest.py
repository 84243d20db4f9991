"""Test configuration.

Tests run on a virtual 8-device CPU mesh so that every sharding /
collective code path is exercised without TPU hardware, per the
multi-device test strategy the reference lacks (SURVEY.md section 4).
Environment must be set before jax is first imported.
"""

import os

# COMMS_TPU_REAL=1 leaves the real TPU attached (for
# tests/test_kernels_tpu.py — the compiled-path hardware suite the
# verify recipe drives); default is the virtual 8-device CPU mesh.
_REAL = os.environ.get("COMMS_TPU_REAL") == "1"

if not _REAL:
    os.environ["JAX_PLATFORMS"] = "cpu"
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402

if not _REAL:
    # The axon TPU plugin force-registers itself regardless of
    # JAX_PLATFORMS; the config update below (after import, before
    # first backend use) wins.
    jax.config.update("jax_platforms", "cpu")
    # Host-side golden tests compare against float64 oracles
    # (complex128/f64 are unsupported on TPU).
    jax.config.update("jax_enable_x64", True)


def pytest_collection_modifyitems(config, items):
    """Under COMMS_TPU_REAL=1 only the hardware suite is valid: the
    rest of the tests need the virtual 8-device CPU mesh and the
    float64 oracles that the flag disables."""
    if not _REAL:
        return
    import pytest

    skip = pytest.mark.skip(
        reason="COMMS_TPU_REAL=1 runs only tests/test_kernels_tpu.py "
               "(CPU-mesh/x64 tests are invalid on the real chip)")
    for item in items:
        if "test_kernels_tpu" not in item.nodeid:
            item.add_marker(skip)
