"""On-device invariant checking and NaN policy.

Capability parity with the reference's runtime-assert layer (SURVEY
§4/§5.2): the reference sprinkles ``assert not torch.isnan(...)`` and a
hard ``exit()`` inside the ODE-ConvGRU step
(/root/reference/modules/ODEConvGRUCell.py:56-64) and leaves
``torch.autograd.set_detect_anomaly(True)`` on globally. TPU-native
equivalents:
  * ``checked_odeint`` — checkify-instrumented solver wrapper raising
    structured on-device errors for NaN states (the jit-compatible form
    of the reference's per-step asserts);
  * ``nan_guard_update`` — optional all-finite gate on the gradient
    update: a non-finite step is skipped instead of poisoning the params
    (the elastic-recovery guard, SURVEY §5.3);
  * ``debug_nans`` config flag (wired in train/loop.py) for the
    global-anomaly-mode equivalent.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import checkify

from ode_rl_tpu.ode import odeint_aux


def checked_odeint(func, y0, ts, **kwargs):
    """odeint with on-device NaN checks on the dynamics output and the
    solution (use under `checkify.checkify`; errors carry step context)."""

    def checked_func(t, y):
        dy = func(t, y)
        leaves = jax.tree_util.tree_leaves(dy)
        finite = jnp.all(jnp.stack([jnp.all(jnp.isfinite(l))
                                    for l in leaves]))
        checkify.check(finite, "non-finite dynamics output at t={t}", t=t)
        return dy

    ys, stats = odeint_aux(checked_func, y0, ts, **kwargs)
    leaves = jax.tree_util.tree_leaves(ys)
    finite = jnp.all(jnp.stack([jnp.all(jnp.isfinite(l)) for l in leaves]))
    checkify.check(finite, "non-finite ODE solution")
    return ys, stats


def all_finite(tree) -> jnp.ndarray:
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.all(jnp.stack([jnp.all(jnp.isfinite(l)) for l in leaves]))


def nan_guard_update(old_params, new_params, grads) -> Tuple[Any, jnp.ndarray]:
    """Return new_params if the gradients were finite, else old_params
    (plus a 0/1 'skipped' flag for telemetry)."""
    ok = all_finite(grads)
    guarded = jax.tree_util.tree_map(
        lambda o, n: jnp.where(ok, n, o), old_params, new_params)
    return guarded, (~ok).astype(jnp.int32)
