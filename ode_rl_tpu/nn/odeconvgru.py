"""ODE-ConvGRU z0-inference encoder.

Capability parity with the reference's ODEConvGRUCell
(/root/reference/modules/ODEConvGRUCell.py:9-78): iterate the observed
frames **backwards in time**, at each step advancing the running latent
with one explicit Euler step of the dynamics field and fusing the actual
encoded observation through a ConvGRU update; a 1×1-conv head maps the
final latent to (mu, std) for z0, with std taken as |·|.

Behavioral quirks replicated on purpose (documented in SURVEY §7.6):
  * the very first (latest-frame) Euler step uses dt = -0.01 regardless of
    the time grid (the reference initializes ``prev_t = ts[-1] + 0.01``);
  * subsequent steps use the reversed grid spacing ts[i] - ts[i+1].

TPU-first: the reference runs a Python loop with NaN asserts and a
host-side exit() per step; here the whole backward pass is one
``lax.scan`` (static-length frame axis) compiled into the training step.
NaN policing is the framework-level debug path (core.debug) instead of
per-step host asserts.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ode_rl_tpu.nn.conv_stacks import ConvNet
from ode_rl_tpu.nn.convgru import ConvGRUCell


class _EulerGRUStep(nn.Module):
    """One backward step: explicit Euler on the dynamics field, then a
    ConvGRU fuse with the encoded observation."""

    ch: int
    ode_n_layers: int
    ode_n_units: int
    kernel_size: int
    dtype: jnp.dtype
    param_dtype: jnp.dtype

    @nn.compact
    def __call__(self, prev, inp):
        x_i, dt_i, m_i = inp
        x_i = x_i.astype(prev.dtype)
        dt_i = dt_i.astype(prev.dtype)  # keep the scan carry in compute dtype
        ode_func = ConvNet(
            out_ch=prev.shape[-1], n_layers=self.ode_n_layers,
            n_units=self.ode_n_units, activation="relu", final_tanh=False,
            dtype=self.dtype, param_dtype=self.param_dtype, name="ode_func")
        cell = ConvGRUCell(
            hidden_dim=self.ch, kernel_size=self.kernel_size,
            dtype=self.dtype, param_dtype=self.param_dtype, name="cgru_cell")
        yi_ode = prev + ode_func(prev) * dt_i
        yi = cell(yi_ode, x_i, m_i)
        return yi, yi


class ODEConvGRUEncoder(nn.Module):
    """Backward ODE-ConvGRU pass producing (mu_z0, std_z0, latents)."""

    ch: int                       # latent / hidden channels
    out_ch: Optional[int] = None  # z0 channels (defaults to ch)
    ode_n_layers: int = 2
    ode_n_units: int = 64
    kernel_size: int = 5
    first_dt: float = -0.01       # the reference's ts[-1]+0.01 bootstrap
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        xs: jnp.ndarray,          # (B, T, H, W, C) encoded observations
        timesteps: jnp.ndarray,   # (T,) observed time points
        mask: Optional[jnp.ndarray] = None,  # (B, T) optional
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        b, t, h, w, c = xs.shape
        out_ch = self.out_ch or self.ch

        # dt sequence for the reversed pass (see module docstring).
        spacing = timesteps[:-1] - timesteps[1:]           # negative steps
        dts = jnp.concatenate(
            [jnp.full((1,), self.first_dt, timesteps.dtype),
             spacing[::-1]])                               # (T,)

        # Time-first layout for a single-axis scan over (frames, dts, mask).
        xs_rev = jnp.moveaxis(xs[:, ::-1], 1, 0)            # (T, B, H, W, C)
        mask_rev = (jnp.ones((t, b), self.dtype) if mask is None
                    else jnp.moveaxis(mask[:, ::-1], 1, 0))  # (T, B)

        scan = nn.scan(
            lambda mod, carry, inp: mod(carry, inp),
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=0,
            out_axes=0,
        )
        step = _EulerGRUStep(
            ch=self.ch, ode_n_layers=self.ode_n_layers,
            ode_n_units=self.ode_n_units, kernel_size=self.kernel_size,
            dtype=self.dtype, param_dtype=self.param_dtype, name="step")
        h0 = jnp.zeros((b, h, w, c), self.dtype)
        last_yi, latent_ys = scan(step, h0, (xs_rev, dts, mask_rev))
        latent_ys = jnp.moveaxis(latent_ys, 0, 1)            # (B, T, ...)

        # (mu, std) head: 1×1 conv → relu → 1×1 conv → 2·out_ch.
        z = nn.Conv(self.ch, (1, 1), dtype=self.dtype,
                    param_dtype=self.param_dtype, name="head_0")(last_yi)
        z = jax.nn.relu(z)
        z = nn.Conv(2 * out_ch, (1, 1), dtype=self.dtype,
                    param_dtype=self.param_dtype, name="head_1")(z)
        mu, std = jnp.split(z, 2, axis=-1)
        return mu, jnp.abs(std), latent_ys
