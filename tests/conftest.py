"""Test harness: force CPU with 8 virtual devices so multi-chip sharding
paths are exercised without TPU hardware (the JAX-native fake backend).

Note: this session's environment pins JAX_PLATFORMS=axon (the TPU tunnel)
and something in interpreter startup locks launch-time env vars, so we set
both the env var and the jax config explicitly before any backend init.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
