"""Memory-mode ODE decoding: ``nru`` (stepwise) and ``nru2`` (two-pass).

The reference defines both modes on its DiffeqSolver
(/root/reference/Vid-ODE/models/ode_func.py:34-67; top-level analogue
/root/reference/modules/DiffEqSolver.py:30-42) as long-horizon
alternatives to one global adaptive solve. Both are degenerate as
written:

  * every per-interval call hands torchdiffeq a SINGLE-element time grid
    (``time_steps_to_predict[i:i+1]``, ode_func.py:39,60) — odeint then
    returns y0 unchanged, so ``h_next = h_prev + m_t`` doubles the state
    each frame (2^T blowup);
  * nru2's first pass accumulates ``h_k = z0 + Σ_{i≤k} y(t_i)``
    (ode_func.py:54-56) — an unnormalized cumulative sum whose magnitude
    grows ~T·‖y‖ before the second pass even starts.

What runs here keeps each mode's structural intent in a stable form:

  * ``nru``  — stepwise integration: h_{i+1} = solve(h_i, [t_i, t_{i+1}]),
    each interval's adaptive solve bounded separately (the mode's point:
    bound one interval instead of one long solve).
  * ``nru2`` — two passes: a global solve over the full grid first, whose
    trajectory is summarized as the mean displacement from z0 (the
    bounded analogue of the reference's Σ-accumulation), then the same
    stepwise pass restarted from that refined state — structurally the
    reference's "global memory pass, then stepwise refinement"
    (ode_func.py:48-66).

TPU-first: both passes are ``lax.scan``s over the output grid — the
per-interval solve traces ONCE, so a 10→190 eval compiles the same
program as 10→10.
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp

from ode_rl_tpu.ode import odeint_aux


def odeint_memory(
    f: Callable,
    z0,
    t_start: jnp.ndarray,
    tp: jnp.ndarray,
    *,
    method: str = "dopri5",
    rtol: float = 1e-3,
    atol: float = 1e-4,
    max_steps: int = 128,
    mode: str = "nru",
) -> Tuple[jnp.ndarray, Dict]:
    """Memory-mode decode of the trajectory at ``tp`` from ``z0`` at
    ``t_start``. Returns (ys time-first (T, ...), metrics dict)."""
    if mode not in ("nru", "nru2"):
        raise NotImplementedError(f"memory mode {mode!r} (nru|nru2)")
    t_grid = jnp.concatenate([jnp.reshape(t_start, (1,)), tp])
    t_pairs = jnp.stack([t_grid[:-1], t_grid[1:]], axis=1)  # (T, 2)
    # Each interval gets the FULL step budget: the mode's point is
    # bounding one interval's adaptive solve separately, not shrinking
    # the budget 8×. The round-5 convergence run showed why this
    # matters: the learned field's stiffness grows as the loss drops
    # (NFE 123→1761 inside 40 steps), a 16-step interval cap then pegs
    # every solve, and the hardened adjoint (zero grads on diverged
    # segments) freezes training at the mean-predictor loss.
    per_interval = max_steps

    z_init = z0
    extra_nfe = 0
    if mode == "nru2":
        # Pass 1: one global solve over the whole grid (the reference's
        # `memory_pred = odeint(first_point, grid)`, ode_func.py:50-52),
        # summarized as mean displacement from z0 (stable analogue of
        # the Σ-accumulation, ode_func.py:54-56). The displacement is a
        # stop-gradient refinement: pass 1 is the "memory" summary and
        # training drives the stepwise pass-2 chain — differentiating a
        # second, possibly step-capped global solve on top of pass 2's
        # adjoint both doubles backward cost and couples training to
        # exactly the solve that saturates first under stiffness growth
        # (the reference's own pass-1 backward is through its degenerate
        # Σ-accumulation, so there is no faithful gradient to preserve).
        ys1, stats1 = odeint_aux(f, z0, t_grid, method=method,
                                 rtol=rtol, atol=atol, max_steps=max_steps)

        def _bounded_disp(traj, z):
            # Trust-region bound: ‖disp‖ ≤ ½‖z0‖ per sample. Without it
            # the mean-displacement init drifts z_init off the manifold
            # the field was trained on as training sharpens the
            # dynamics; the round-5 run showed the failure chain —
            # pass-2 solves diverge from the shifted state, the decode
            # sigmoid saturates at the all-zeros prediction
            # (loss pins at E[x²] ≈ 0.068 on MMNIST) and every gradient
            # dies. Bounded, the refinement stays a refinement.
            d = jnp.mean(traj, axis=0) - z
            axes = tuple(range(1, d.ndim))
            dn = jnp.sqrt(jnp.sum(d * d, axis=axes, keepdims=True))
            zn = jnp.sqrt(jnp.sum(z * z, axis=axes, keepdims=True))
            scale = jnp.minimum(1.0, 0.5 * zn / (dn + 1e-8))
            return jax.lax.stop_gradient(d * scale)

        disp = jax.tree_util.tree_map(_bounded_disp, ys1, z0)
        z_init = jax.tree_util.tree_map(jnp.add, z0, disp)
        extra_nfe = stats1.nfe

    def step(h_prev, seg):
        ys, stats = odeint_aux(f, h_prev, seg, method=method,
                               rtol=rtol, atol=atol, max_steps=per_interval)
        h_next = jax.tree_util.tree_map(lambda a: a[-1], ys)
        return h_next, (h_next, stats.nfe)

    _, (ys_scan, nfes) = jax.lax.scan(step, z_init, t_pairs)
    return ys_scan, {"nfe": jnp.sum(nfes) + extra_nfe}
