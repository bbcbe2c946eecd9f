"""Test configuration: force CPU with 8 virtual devices.

Distributed/sharding tests run on a simulated 8-device mesh via
``--xla_force_host_platform_device_count`` — the standard JAX trick for
validating multi-chip SPMD programs without real hardware. Must run before
jax initializes its backends, hence the env mutation at import time.
"""

import os

# Force CPU: the session environment pins JAX_PLATFORMS to the tunneled TPU
# ("axon"), which would make every eager linalg call a remote round-trip.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon TPU plugin (sitecustomize) overrides jax_platforms via
# jax.config.update, which takes precedence over the env var — override it
# back so tests run on the 8 virtual CPU devices.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
