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

os.environ["JAX_PLATFORMS"] = "cpu"
# Keep any python subprocesses spawned by tests from re-registering the tunnel.
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
