"""Convolutional encoder/decoder stacks and the ODE dynamics convnet.

Capability parity with the reference's net factories:
  * ConvEncoder ≙ strided conv downsampling stacks
    (/root/reference/models/ODEConvGRU.py:101-119 and
    /root/reference/models/ConvGRU.py:75-77);
  * ConvDecoder ≙ transposed-conv upsampling stacks
    (/root/reference/models/ODEConvGRU.py:122-140,
    /root/reference/models/ConvGRU.py:179-181);
  * ConvNet ≙ ``create_convnet`` (3×3 stride-1 convs, optional final tanh,
    /root/reference/helpers/utils.py:158-183) — used as the ODE dynamics
    field f(t, y) (autonomous; t is accepted and ignored, matching
    ODEFunc at /root/reference/modules/DiffEqSolver.py:57-80).

All NHWC, dtype-polymorphic (bf16 compute / fp32 params on TPU).
"""

from __future__ import annotations

from typing import Callable

import flax.linen as nn
import jax
import jax.numpy as jnp


def _act(name: str) -> Callable[[jnp.ndarray], jnp.ndarray]:
    if name == "relu":
        return jax.nn.relu
    if name == "leaky_relu":
        return lambda x: jax.nn.leaky_relu(x, negative_slope=0.2)
    if name == "tanh":
        return jnp.tanh
    if name == "elu":
        return jax.nn.elu
    raise NotImplementedError(f"unknown activation {name!r}")


class ConvEncoder(nn.Module):
    """Stride-2 conv downsampling: 64×64 → 64/2^n_downs, like the
    reference's frame encoders (first width 16, doubling, final out_ch)."""

    out_ch: int
    n_downs: int = 2
    first_ch: int = 16
    activation: str = "leaky_relu"
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        act = _act(self.activation)
        ch = self.first_ch
        conv = lambda feats, name: nn.Conv(
            feats, (3, 3), strides=(2, 2), padding=1,
            dtype=self.dtype, param_dtype=self.param_dtype, name=name)
        for i in range(self.n_downs - 1):
            x = act(conv(ch, f"down_{i}")(x))
            ch *= 2
        x = act(conv(self.out_ch, f"down_{self.n_downs - 1}")(x))
        return x


class ConvDecoder(nn.Module):
    """Transposed-conv ×2 upsampling per layer (kernel 4 stride 2),
    mirroring the reference decoders; no final activation (models apply
    sigmoid at the output, reference ODEConvGRU.py:85 / ConvGRU.py:40)."""

    out_ch: int
    n_ups: int = 2
    first_ch: int = 32
    activation: str = "leaky_relu"
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        act = _act(self.activation)
        deconv = lambda feats, name: nn.ConvTranspose(
            feats, (4, 4), strides=(2, 2), padding="SAME",
            dtype=self.dtype, param_dtype=self.param_dtype, name=name)
        ch = self.first_ch
        for i in range(self.n_ups - 1):
            x = act(deconv(ch, f"up_{i}")(x))
            ch //= 2
        x = deconv(self.out_ch, f"up_{self.n_ups - 1}")(x)
        return x


class Conv3x3(nn.Module):
    """3×3 stride-1 SAME conv with nn.Conv-identical parameters
    ('kernel' HWIO lecun-normal, 'bias' zeros — checkpoints interchange
    freely), dispatching to the VMEM implicit-im2col Pallas kernel on
    TPU bf16 shapes and to XLA otherwise (ops/conv3x3.py)."""

    features: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from ode_rl_tpu.ops.conv3x3 import conv3x3_same
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (3, 3, x.shape[-1], self.features), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), self.param_dtype)
        x = x.astype(self.dtype)
        return conv3x3_same(x, kernel.astype(self.dtype),
                            bias.astype(self.dtype))


class ConvNet(nn.Module):
    """3×3 stride-1 conv tower: in → units ×(n_layers) → out.

    The workhorse ODE dynamics field. ``final_tanh`` matches the
    reference's ``final_act`` flag (off for the ODEConvGRU dynamics)."""

    out_ch: int
    n_layers: int = 2
    n_units: int = 64
    activation: str = "relu"
    final_tanh: bool = False
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, y: jnp.ndarray) -> jnp.ndarray:
        act = _act(self.activation)
        conv = lambda feats, name: Conv3x3(
            feats, dtype=self.dtype, param_dtype=self.param_dtype,
            name=name)
        x = conv(self.n_units, "in")(y)
        for i in range(self.n_layers):
            x = conv(self.n_units, f"mid_{i}")(act(x))
        x = conv(self.out_ch, "out")(act(x))
        if self.final_tanh:
            x = jnp.tanh(x)
        return x
