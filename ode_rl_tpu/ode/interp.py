"""Quartic dense-output interpolation for adaptive RK solvers.

Standard Shampine interpolant: fit a 4th-order polynomial through
(y0, y_mid, y1) with endpoint slopes (f0, f1) over one accepted step, then
evaluate at arbitrary fractions θ ∈ [0, 1]. This is how requested output
times are hit without constraining the adaptive step sequence — the same
dense-output scheme the reference's torchdiffeq backend uses, so output
values agree to interpolation order (reference consumes it through
``odeint(func, z0, tp_to_predict)``, /root/reference/modules/DiffEqSolver.py:45).

All functions are pytree-polymorphic over the state.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp

Pytree = Any


def interp_fit(y0: Pytree, y1: Pytree, y_mid: Pytree, f0: Pytree, f1: Pytree,
               dt: jnp.ndarray) -> Tuple[Pytree, ...]:
    """Return polynomial coefficients (a, b, c, d, e) per state leaf with
    y(t0 + θ·dt) = e + θ·(d + θ·(c + θ·(b + θ·a)))."""

    def fit(y0, y1, ym, f0, f1):
        a = 2.0 * dt * (f1 - f0) - 8.0 * (y1 + y0) + 16.0 * ym
        b = dt * (5.0 * f0 - 3.0 * f1) + 18.0 * y0 + 14.0 * y1 - 32.0 * ym
        c = dt * (f1 - 4.0 * f0) - 11.0 * y0 - 5.0 * y1 + 16.0 * ym
        d = dt * f0
        e = y0
        return a, b, c, d, e

    fitted = jax.tree_util.tree_map(fit, y0, y1, y_mid, f0, f1)
    # Transpose: pytree-of-tuples → tuple-of-pytrees.
    return tuple(
        jax.tree_util.tree_map(lambda t, i=i: t[i], fitted,
                               is_leaf=lambda x: isinstance(x, tuple))
        for i in range(5)
    )


def interp_eval(coeffs: Tuple[Pytree, ...], theta: jnp.ndarray) -> Pytree:
    """Evaluate the fitted polynomial at fraction ``theta`` of the step."""
    a, b, c, d, e = coeffs
    return jax.tree_util.tree_map(
        lambda a, b, c, d, e: e + theta * (d + theta * (c + theta * (b + theta * a))),
        a, b, c, d, e,
    )
