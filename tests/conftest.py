"""Test configuration.

Tests run on CPU with 8 virtual devices so multi-chip sharding semantics are
exercised without TPU hardware (SURVEY.md §4 distributed test strategy).
Must run before the first `import jax` anywhere.

The session environment pins JAX_PLATFORMS=axon (the TPU tunnel) and a
sitecustomize hook re-forces jax_platforms="axon,cpu" from inside its PJRT
register().  Tests must run on CPU: the tunnel serializes clients and the
MXU's default bf16 matmul precision breaks float32 parity assertions.
Setting the env var is not enough — override the jax config again after
import (config.update wins over the sitecustomize hook).
"""

import os

# PB_TPU_TESTS=1 keeps the real backend so @pytest.mark.tpu lowering smoke
# tests can compile with interpret=False (run: PB_TPU_TESTS=1 pytest -m tpu).
_TPU_TESTS = os.environ.get("PB_TPU_TESTS") == "1"

if not _TPU_TESTS:
    os.environ["JAX_PLATFORMS"] = "cpu"
# Keep any python subprocesses spawned by tests from re-registering the tunnel.
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if not _TPU_TESTS:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

import pytest  # noqa: E402


def pytest_collection_modifyitems(config, items):
    """tpu-marked tests only run under PB_TPU_TESTS=1 (real backend); all
    other tests only run on the pinned-CPU backend — the two modes are
    mutually exclusive so float32-parity assertions never hit the MXU."""
    for item in items:
        is_tpu = bool(item.get_closest_marker("tpu"))
        if is_tpu and not _TPU_TESTS:
            item.add_marker(pytest.mark.skip(reason="needs PB_TPU_TESTS=1 + TPU"))
        elif _TPU_TESTS and not is_tpu:
            item.add_marker(pytest.mark.skip(reason="CPU-parity test; unset PB_TPU_TESTS"))
