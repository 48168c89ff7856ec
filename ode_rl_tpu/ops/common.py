"""Dispatch policy for Pallas-vs-XLA op implementations."""

from __future__ import annotations

import os

import jax


def use_pallas() -> bool:
    """Compiled Pallas kernels only make sense on a real TPU backend."""
    if os.environ.get("ODE_RL_TPU_NO_PALLAS"):
        return False
    try:
        platform = jax.default_backend()
    except Exception:
        return False
    return platform in ("tpu", "axon")
