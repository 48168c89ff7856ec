"""Latent-space planners: CEM and gradient-based.

Capability parity with the planner utilities in
/root/reference/dreamerv2/tools.py (the CEM and gradient planners the
Dreamer codebase ships alongside its world model): plan an action
sequence by rolling candidate sequences through a latent dynamics model
and maximizing predicted return.

Generic over the dynamics: the caller supplies
``rollout_fn(action_seq, key) -> returns`` mapping (P, H, A) candidate
action sequences to (P,) returns (e.g. imagine through the RSSM prior
and score with a reward head). Fully jittable; iterations are
``lax.fori_loop``.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def cem_planner(
    rollout_fn: Callable,
    key,
    horizon: int,
    action_dim: int,
    iterations: int = 10,
    proposals: int = 1000,
    topk: int = 100,
    init_std: float = 1.0,
) -> jnp.ndarray:
    """Cross-entropy-method planning → best (H, A) action sequence."""

    def iteration(carry, it_key):
        mean, std = carry
        k1, k2 = jax.random.split(it_key)
        noise = jax.random.normal(k1, (proposals, horizon, action_dim))
        candidates = mean[None] + std[None] * noise
        returns = rollout_fn(candidates, k2)           # (P,)
        _, elite_idx = jax.lax.top_k(returns, topk)
        elites = candidates[elite_idx]
        new_mean = elites.mean(axis=0)
        new_std = elites.std(axis=0) + 1e-6
        return (new_mean, new_std), None

    mean0 = jnp.zeros((horizon, action_dim))
    std0 = jnp.full((horizon, action_dim), init_std)
    keys = jax.random.split(key, iterations)
    (mean, _std), _ = jax.lax.scan(iteration, (mean0, std0), keys)
    return mean


def grad_planner(
    rollout_fn: Callable,
    key,
    horizon: int,
    action_dim: int,
    iterations: int = 50,
    lr: float = 0.1,
    init_std: float = 0.1,
) -> jnp.ndarray:
    """Gradient-ascent planning on a single action sequence."""
    k0, k_roll = jax.random.split(key)
    actions0 = init_std * jax.random.normal(k0, (horizon, action_dim))

    def objective(actions, k):
        return -jnp.mean(rollout_fn(actions[None], k))

    def step(actions, it_key):
        g = jax.grad(objective)(actions, it_key)
        return actions - lr * g, None

    keys = jax.random.split(k_roll, iterations)
    actions, _ = jax.lax.scan(step, actions0, keys)
    return actions
