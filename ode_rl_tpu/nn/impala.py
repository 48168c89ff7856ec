"""IMPALA residual CNN.

Capability parity with /root/reference/modules/ImpalaCNN.py:13-69 (and
the TF copy in ModelBasedRL_TF_V2/networks.py:287-359): a stack of
blocks — conv → 3×3/2 max-pool → two residual units (each two 3×3 convs
with ReLU pre-activation) — at depths (16, 32, 64, 128), with an
optional flatten+Dense head.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


class _ResidualUnit(nn.Module):
    ch: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        conv = lambda name: nn.Conv(self.ch, (3, 3), padding="SAME",
                                    dtype=self.dtype,
                                    param_dtype=self.param_dtype, name=name)
        h = conv("c0")(jax.nn.relu(x))
        h = conv("c1")(jax.nn.relu(h))
        return x + h


class ImpalaCNN(nn.Module):
    depths: Sequence[int] = (16, 32, 64, 128)
    out_features: Optional[int] = None   # optional Dense head

    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for bi, ch in enumerate(self.depths):
            x = nn.Conv(ch, (3, 3), padding="SAME", dtype=self.dtype,
                        param_dtype=self.param_dtype,
                        name=f"block{bi}_conv")(x)
            x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")
            x = _ResidualUnit(ch, dtype=self.dtype,
                              param_dtype=self.param_dtype,
                              name=f"block{bi}_res0")(x)
            x = _ResidualUnit(ch, dtype=self.dtype,
                              param_dtype=self.param_dtype,
                              name=f"block{bi}_res1")(x)
        x = jax.nn.relu(x)
        if self.out_features is not None:
            x = x.reshape(x.shape[0], -1)
            x = jax.nn.relu(nn.Dense(self.out_features, dtype=self.dtype,
                                     param_dtype=self.param_dtype,
                                     name="fc")(x))
        return x
