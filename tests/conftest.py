"""Test harness: force CPU with 8 virtual devices so multi-chip sharding
paths are exercised without TPU hardware (the JAX-native fake backend).

Note: this session's environment pins JAX_PLATFORMS=axon (the TPU tunnel)
and something in interpreter startup locks launch-time env vars, so we set
both the env var and the jax config explicitly before any backend init.
"""

import os
import pathlib

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent XLA compilation cache: whole-train-step compiles dominate the
# suite's wall clock; cached re-runs skip them entirely. Best effort — on
# JAX builds without CPU-cache support this is a no-op.
try:
    jax.config.update("jax_compilation_cache_dir",
                      str(pathlib.Path(__file__).parent / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

# ---------------------------------------------------------------------------
# Two-tier suite: `pytest` runs the fast tier (<5 min on this image);
# tests marked @pytest.mark.slow (whole-train-step XLA compiles, long
# reference-parity sweeps) need --slow / RUN_SLOW=1. CI / pre-round runs
# use scripts/run_tests_full.sh for the whole thing.

import pytest  # noqa: E402


def pytest_addoption(parser):
    parser.addoption("--slow", action="store_true", default=False,
                     help="also run tests marked slow (full tier)")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--slow") or os.environ.get("RUN_SLOW"):
        return
    skip = pytest.mark.skip(reason="slow tier: pass --slow or RUN_SLOW=1")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
