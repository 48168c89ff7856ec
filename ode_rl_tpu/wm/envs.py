"""On-device control environments for the Dreamer RL loop.

The reference repo is named ODE-RL and vendors DreamerV2, but contains
no runnable RL: the actor-critic is commented out and no environment
with actions/rewards ships (dreamerv2/wrappers.py expects external Atari
/DMC installs). This module provides a minimal fully-on-device control
task so the whole Dreamer loop — collect with actions → train an
action-conditioned world model with a reward head → train the
actor-critic purely in imagination (wm/behavior.py) → evaluate in the
environment — runs end-to-end on one chip, jittable throughout.

ControlledDigit: an MNIST sprite on a 64×64 canvas; the 2-D action in
[-1, 1]² sets the digit's velocity; reward is the digit's normalized
x-position (drive the digit right and keep it there). Same visual
domain as the framework's MovingMNIST models, so the world model
reuses the ConvEncoder/ConvDecoder stack unchanged.
"""

from __future__ import annotations

import functools
from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp

SPRITE = 28
CANVAS = 64
POS_MAX = float(CANVAS - SPRITE)   # 36
SPEED = 4.0

EnvState = Dict[str, jnp.ndarray]


def reset(key, sprite_bank: jnp.ndarray, batch: int) -> EnvState:
    """Random sprite identity + random start position."""
    k1, k2 = jax.random.split(key)
    idx = jax.random.randint(k1, (batch,), 0, sprite_bank.shape[0])
    pos = jax.random.uniform(k2, (batch, 2), minval=0.0, maxval=POS_MAX)
    return {"idx": idx, "pos": pos}


def render(state: EnvState, sprite_bank: jnp.ndarray) -> jnp.ndarray:
    """(B, 64, 64, 1) float32 in [-0.5, 0.5]."""
    sprites = sprite_bank[state["idx"]].astype(jnp.float32) / 255.0

    def place(sprite, pos):
        canvas = jnp.zeros((CANVAS, CANVAS), jnp.float32)
        y = jnp.clip(jnp.round(pos[1]).astype(jnp.int32), 0,
                     CANVAS - SPRITE)
        x = jnp.clip(jnp.round(pos[0]).astype(jnp.int32), 0,
                     CANVAS - SPRITE)
        return jax.lax.dynamic_update_slice(canvas, sprite, (y, x))

    frames = jax.vmap(place)(sprites, state["pos"])
    return frames[..., None] - 0.5


def step(state: EnvState, action: jnp.ndarray
         ) -> Tuple[EnvState, jnp.ndarray]:
    """pos += SPEED·action (clipped); reward = x / POS_MAX ∈ [0, 1]."""
    pos = jnp.clip(state["pos"] + SPEED * jnp.clip(action, -1.0, 1.0),
                   0.0, POS_MAX)
    new_state = {"idx": state["idx"], "pos": pos}
    reward = pos[:, 0] / POS_MAX
    return new_state, reward


@functools.partial(jax.jit, static_argnames=("batch", "horizon",
                                             "policy_fn"))
def collect_random(key, sprite_bank, batch: int, horizon: int,
                   policy_fn: Callable = None) -> Dict[str, jnp.ndarray]:
    """Roll ``horizon`` env steps → episode batch in the world-model
    format: image (B, T, 64, 64, 1), action (B, T, A), reward (B, T)
    with action_t the action that produced obs_t (a_0 = 0 for the reset
    observation, the reference's episode convention)."""
    k_reset, k_roll = jax.random.split(key)
    state0 = reset(k_reset, sprite_bank, batch)

    def body(carry, k):
        env_state = carry
        if policy_fn is None:
            a = jax.random.uniform(k, (batch, 2), minval=-1.0, maxval=1.0)
        else:
            obs = render(env_state, sprite_bank)
            a = policy_fn(obs, k)
        nxt, r = step(env_state, a)
        return nxt, (render(nxt, sprite_bank), a, r)

    keys = jax.random.split(k_roll, horizon - 1)
    _, (obs, act, rew) = jax.lax.scan(body, state0, keys)
    obs0 = render(state0, sprite_bank)[:, None]
    image = jnp.concatenate([obs0, jnp.moveaxis(obs, 0, 1)], axis=1)
    action = jnp.concatenate([jnp.zeros((batch, 1, 2)),
                              jnp.moveaxis(act, 0, 1)], axis=1)
    reward = jnp.concatenate([state0["pos"][:, :1] / POS_MAX,
                              jnp.moveaxis(rew, 0, 1)], axis=1)
    return {"image": image, "action": action, "reward": reward}
