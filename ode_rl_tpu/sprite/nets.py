"""DCGAN-style frame encoder/decoder for the Sprites DS-VAE.

Capability parity with /root/reference/code_sprite/models/dcgan_64.py
(the `endecoder_model` the reference passes into DisentangledVAE):
4 stride-2 conv blocks with BatchNorm + LeakyReLU to a g_dim vector, and
the mirrored no-skip decoder ending in sigmoid.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class DCGANEncoder(nn.Module):
    g_dim: int = 128
    nf: int = 64
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        """(B, 64, 64, C) → (B, g_dim)."""
        lrelu = lambda v: jax.nn.leaky_relu(v, negative_slope=0.2)
        bn = lambda name: nn.BatchNorm(use_running_average=not train,
                                       momentum=0.9, epsilon=1e-5,
                                       dtype=self.dtype, name=name)
        conv = lambda f, k, s, p, name: nn.Conv(
            f, (k, k), strides=(s, s), padding=p, dtype=self.dtype,
            param_dtype=self.param_dtype, name=name)
        x = lrelu(conv(self.nf, 4, 2, 1, "c1")(x))            # 32
        x = lrelu(bn("b2")(conv(2 * self.nf, 4, 2, 1, "c2")(x)))   # 16
        x = lrelu(bn("b3")(conv(4 * self.nf, 4, 2, 1, "c3")(x)))   # 8
        x = lrelu(bn("b4")(conv(8 * self.nf, 4, 2, 1, "c4")(x)))   # 4
        x = jnp.tanh(bn("b5")(conv(self.g_dim, 4, 1, 0, "c5")(x)))  # 1
        return x.reshape(x.shape[0], self.g_dim)


class DCGANDecoder(nn.Module):
    out_channels: int = 3
    nf: int = 64
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        """(B, D) → (B, 64, 64, C) in [0, 1]."""
        lrelu = lambda v: jax.nn.leaky_relu(v, negative_slope=0.2)
        bn = lambda name: nn.BatchNorm(use_running_average=not train,
                                       momentum=0.9, epsilon=1e-5,
                                       dtype=self.dtype, name=name)
        deconv = lambda f, k, s, p, name: nn.ConvTranspose(
            f, (k, k), strides=(s, s),
            padding="VALID" if p == 0 else "SAME", dtype=self.dtype,
            param_dtype=self.param_dtype, name=name)
        x = z.reshape(z.shape[0], 1, 1, -1)
        x = lrelu(bn("b1")(deconv(8 * self.nf, 4, 1, 0, "d1")(x)))  # 4
        x = lrelu(bn("b2")(deconv(4 * self.nf, 4, 2, 1, "d2")(x)))  # 8
        x = lrelu(bn("b3")(deconv(2 * self.nf, 4, 2, 1, "d3")(x)))  # 16
        x = lrelu(bn("b4")(deconv(self.nf, 4, 2, 1, "d4")(x)))      # 32
        x = deconv(self.out_channels, 4, 2, 1, "d5")(x)             # 64
        return jax.nn.sigmoid(x)
