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
    ConvGRU fuse with the encoded observation.

    The observation-side gate convolutions don't depend on the running
    latent, so the encoder hoists them for ALL frames into one batched
    conv (``project``) and the scan body consumes the precomputed
    projections via the cell's ``step_fused`` — see nn/convgru.py."""

    ch: int
    x_ch: int                    # encoded-observation channels
    ode_n_layers: int
    ode_n_units: int
    kernel_size: int
    dtype: jnp.dtype
    param_dtype: jnp.dtype
    fused: bool = False          # consume hoisted projections (see below)

    def setup(self):
        self.ode_func = ConvNet(
            out_ch=self.ch, n_layers=self.ode_n_layers,
            n_units=self.ode_n_units, activation="relu", final_tanh=False,
            dtype=self.dtype, param_dtype=self.param_dtype)
        self.cgru_cell = ConvGRUCell(
            hidden_dim=self.ch, kernel_size=self.kernel_size,
            dtype=self.dtype, param_dtype=self.param_dtype)

    def project(self, xs_flat):
        return self.cgru_cell.project_x(xs_flat)

    def __call__(self, prev, inp):
        if self.fused:
            gx_i, cx_i, dt_i, m_i = inp
            dt_i = dt_i.astype(prev.dtype)  # keep carry in compute dtype
            yi_ode = prev + self.ode_func(prev) * dt_i
            yi = self.cgru_cell.step_fused(
                yi_ode, gx_i.astype(prev.dtype), cx_i.astype(prev.dtype),
                self.x_ch, m_i)
            return yi, yi
        x_i, dt_i, m_i = inp
        x_i = x_i.astype(prev.dtype)
        dt_i = dt_i.astype(prev.dtype)
        yi_ode = prev + self.ode_func(prev) * dt_i
        yi = self.cgru_cell(yi_ode, x_i, m_i)
        return yi, yi


class ODEConvGRUEncoder(nn.Module):
    """Backward ODE-ConvGRU pass producing (mu_z0, std_z0, latents)."""

    ch: int                       # latent / hidden channels
    out_ch: Optional[int] = None  # z0 channels (defaults to ch)
    ode_n_layers: int = 2
    ode_n_units: int = 64
    kernel_size: int = 5
    first_dt: float = -0.01       # the reference's ts[-1]+0.01 bootstrap
    # Hoist the observation-side gate convolutions out of the scan
    # (cuDNN-RNN style, nn/convgru.py project_x/step_fused). MEASURED
    # (v5e, flagship bench, round 5): the hoist costs the flagship 4%
    # (38.0k vs 39.5k frames/s; step 67.3 vs 64.8 ms) — at t_in=10 the
    # in-scan concat-conv XLA already emits is faster than the split
    # h-side conv + precomputed-projection adds, so this stays DEFAULT
    # OFF here (the gru_gates precedent: keep the lever, ship the
    # measured winner). Free-run decoders keep their win: with no input
    # at all the x-side conv disappears entirely (convgru_freerun /
    # models/convlstm.py project paths, test_fast_rnn.py).
    hoist_projections: bool = False
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
            ch=self.ch, x_ch=c, ode_n_layers=self.ode_n_layers,
            ode_n_units=self.ode_n_units, kernel_size=self.kernel_size,
            fused=self.hoist_projections,
            dtype=self.dtype, param_dtype=self.param_dtype, name="step")
        h0 = jnp.zeros((b, h, w, c), self.dtype)
        if self.hoist_projections:
            # Hoisted observation projections: one batched conv over all
            # T frames instead of T small convs inside the sequential
            # scan. Project from the (B, T) layout with the BATCH dim
            # leading: merging (T·B) with T leading interleaves the
            # 'data'-sharded batch across shards, and XLA:SPMD
            # miscompiles the conv GRADIENT's halo exchange for that
            # layout (forward exact, grads off by orders of magnitude —
            # minimal repro pinned in tests/test_mesh.py::
            # test_hoisted_conv_grad_sharding_layout).
            gx, cx = step.project(xs.reshape((b * t, h, w, c)))
            to_rev_tb = lambda v: jnp.moveaxis(
                v.reshape((b, t) + v.shape[1:])[:, ::-1], 1, 0)
            last_yi, latent_ys = scan(
                step, h0, (to_rev_tb(gx), to_rev_tb(cx), dts, mask_rev))
        else:
            # Default: plain concat-conv cell inside the scan — measured
            # faster on the flagship (see hoist_projections docstring).
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
