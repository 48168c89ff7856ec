"""Dreamer utility toolbox.

Capability parity with /root/reference/dreamerv2/tools.py: schedule
strings (constant / ``linear(a,b,steps)`` / ``warmup`` / ``horizon``,
tools.py schedule), the Every/Once/Until step gates (:741-781),
λ-returns (:lambda_return), and the straight-through one-hot sampler
backing OneHotDist. ``static_scan`` (:643-657) needs no counterpart —
``jax.lax.scan`` is the native construct the TF code was emulating.
"""

from __future__ import annotations

import re
import jax
import jax.numpy as jnp


def schedule(string, step) -> jnp.ndarray:
    """Evaluate a schedule spec at ``step`` (traced-safe)."""
    step = jnp.asarray(step, jnp.float32)
    if isinstance(string, (int, float)):
        return jnp.asarray(float(string), jnp.float32)
    m = re.match(r"linear\((.+),(.+),(.+)\)", string)
    if m:
        initial, final, duration = map(float, m.groups())
        mix = jnp.clip(step / duration, 0.0, 1.0)
        return (1.0 - mix) * initial + mix * final
    m = re.match(r"warmup\((.+),(.+)\)", string)
    if m:
        warmup, value = map(float, m.groups())
        scale = jnp.clip(step / warmup, 0.0, 1.0)
        return scale * value
    m = re.match(r"exp\((.+),(.+),(.+)\)", string)
    if m:
        initial, final, halflife = map(float, m.groups())
        return (initial - final) * 0.5 ** (step / halflife) + final
    m = re.match(r"horizon\((.+),(.+),(.+)\)", string)
    if m:
        initial, final, duration = map(float, m.groups())
        mix = jnp.clip(step / duration, 0.0, 1.0)
        horizon = (1.0 - mix) * initial + mix * final
        return 1.0 - 1.0 / horizon
    try:
        return jnp.asarray(float(string), jnp.float32)
    except ValueError as e:
        raise NotImplementedError(string) from e


def lambda_return(reward, value, pcont, bootstrap, lambda_, axis=0):
    """Generalized λ-return along ``axis`` (reference tools.lambda_return):
    V_λ(t) = r_t + γ_t [(1−λ) v_{t+1} + λ V_λ(t+1)]."""
    if axis != 0:
        reward = jnp.moveaxis(reward, axis, 0)
        value = jnp.moveaxis(value, axis, 0)
        pcont = jnp.moveaxis(pcont, axis, 0)
    next_values = jnp.concatenate([value[1:], bootstrap[None]], axis=0)
    inputs = reward + pcont * next_values * (1.0 - lambda_)

    def step(carry, xs):
        inp, pc = xs
        ret = inp + pc * lambda_ * carry
        return ret, ret

    _, returns = jax.lax.scan(step, bootstrap, (inputs, pcont), reverse=True)
    if axis != 0:
        returns = jnp.moveaxis(returns, 0, axis)
    return returns


def one_hot_st_sample(key, logits):
    """Straight-through one-hot categorical sample over the last axis
    (the OneHotDist trick: sample + probs − sg(probs))."""
    idx = jax.random.categorical(key, logits)
    sample = jax.nn.one_hot(idx, logits.shape[-1], dtype=logits.dtype)
    probs = jax.nn.softmax(logits)
    return sample + probs - jax.lax.stop_gradient(probs)


class Every:
    def __init__(self, every: int):
        self._every = every
        self._last = None

    def __call__(self, step: int) -> bool:
        if not self._every:
            return False
        if self._last is None or step >= self._last + self._every:
            self._last = step
            return True
        return False


class Once:
    def __init__(self):
        self._done = False

    def __call__(self) -> bool:
        if self._done:
            return False
        self._done = True
        return True


class Until:
    def __init__(self, until: int):
        self._until = until

    def __call__(self, step: int) -> bool:
        return bool(step < self._until) if self._until else True
