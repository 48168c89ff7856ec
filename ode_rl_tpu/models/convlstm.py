"""Stacked ConvLSTM/ConvGRU encoder–forecaster (the ConvLSTM-PyTorch
sub-repo's capability).

Capability parity with /root/reference/ConvLSTM-PyTorch/: Shi-style
stacked encoder–forecaster on Moving MNIST —
  * CLSTM_cell / CGRU_cell: single fused gate conv + GroupNorm
    (ConvRNN.py:16-120);
  * 3-stage encoder (strided conv + cell per stage, net_params.py specs:
    convs 1→16/64→64/96→96 stride 2, cells 16→64, 64→96, 96→96) and the
    mirrored 3-stage forecaster (deconvs 96→96/96→96 + head 64→16→1)
    driven from the encoder states in reverse order (encoder.py /
    decoder.py / model.py ED wrapper);
  * sigmoid output, MSE/… loss, early stopping + ReduceLROnPlateau are
    provided by train/schedulers.py.

TPU-first: every stage's time loop is a lax.scan; cells are NHWC.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class ConvLSTMCell(nn.Module):
    """One ConvLSTM step: fused 4-gate conv + GroupNorm (ConvRNN.py:70+).

    The gate conv over ``concat([x, h])`` is linear in its input
    channels, so the scan driver hoists the x-side conv of ALL timesteps
    into one batched (B·T) conv before the scan (``project_x``) and runs
    only the hidden-side conv per step (``step_fused``) — the same
    split-kernel trick as nn/convgru.py; the GroupNorm applies to the
    conv OUTPUT so it is unaffected by the input split. Param tree is
    unchanged (same ``gates``/``norm`` paths)."""

    num_features: int
    filter_size: int = 5
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        from ode_rl_tpu.nn.convgru import _ConvParams

        self.gates = _ConvParams(4 * self.num_features, self.filter_size,
                                 self.param_dtype)
        self.norm = nn.GroupNorm(
            num_groups=max(4 * self.num_features // 32, 1),
            dtype=self.dtype)

    def __call__(self, carry, x: Optional[jnp.ndarray]):
        from ode_rl_tpu.nn.convgru import _conv_same

        h, c = carry
        if x is None:
            x = jnp.zeros(h.shape[:-1] + (self.num_features,), h.dtype)
        gk, gb = self.gates(x.shape[-1] + h.shape[-1])
        raw = _conv_same(jnp.concatenate([x, h], axis=-1), gk, gb,
                         self.dtype)
        return self._finish(h, c, raw)

    def project_x(self, x: jnp.ndarray) -> jnp.ndarray:
        """x-side half of the gate conv, bias folded in (N, H, W, 4F)."""
        from ode_rl_tpu.nn.convgru import _conv_same

        gk, gb = self.gates(x.shape[-1] + self.num_features)
        return _conv_same(x, gk[:, :, :x.shape[-1]], gb, self.dtype)

    def project_zero(self) -> jnp.ndarray:
        """Free-run projection: conv of zeros is just the bias."""
        _, gb = self.gates(2 * self.num_features)
        return jnp.asarray(gb, self.dtype).reshape(1, 1, 1, -1)

    def step_fused(self, carry, gx: jnp.ndarray, x_ch: int):
        from ode_rl_tpu.nn.convgru import _conv_same

        h, c = carry
        gk, _ = self.gates(x_ch + self.num_features)
        raw = gx + _conv_same(h, gk[:, :, x_ch:], None, self.dtype)
        return self._finish(h, c, raw)

    def _finish(self, h, c, raw):
        gates = self.norm(raw)
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
        g = jnp.tanh(g)
        c_new = f * c + i * g
        h_new = o * jnp.tanh(c_new)
        return (h_new, c_new), h_new


def _scan_cell(cell, carry, xs, length, fused: bool = True):
    """Scan a cell over time; xs may be None (free-run)."""
    if fused:
        if xs is None:
            gx = cell.project_zero()
            x_ch = cell.num_features
            scan = nn.scan(
                lambda mod, cy, _: mod.step_fused(cy, gx, x_ch),
                variable_broadcast="params", split_rngs={"params": False},
                out_axes=1, length=length)
            return scan(cell, carry, None)
        b, t = xs.shape[:2]
        x_ch = xs.shape[-1]
        gx = cell.project_x(xs.reshape((b * t,) + xs.shape[2:]))
        gx = gx.reshape((b, t) + gx.shape[1:])
        scan = nn.scan(
            lambda mod, cy, g: mod.step_fused(cy, g, x_ch),
            variable_broadcast="params", split_rngs={"params": False},
            in_axes=1, out_axes=1)
        return scan(cell, carry, gx)
    scan = nn.scan(
        lambda mod, c, x: mod(c, x),
        variable_broadcast="params", split_rngs={"params": False},
        in_axes=1, out_axes=1, length=length if xs is None else None)
    return scan(cell, carry, xs)


# (conv_spec, cell_features): conv_spec = (out_ch, kernel, stride)
ENCODER_STAGES = [((16, 3, 2), 64), ((64, 3, 2), 96), ((96, 3, 2), 96)]
DECODER_DECONVS = [(96, 4, 2), (96, 4, 2)]   # between stages (upsample)


class ConvLSTMED(nn.Module):
    """Encoder–forecaster with the reference's stage plan.

    ``encoder_stages``/``decoder_deconvs`` default to the reference plan
    (ENCODER_STAGES/DECODER_DECONVS); smaller plans are used by the
    multi-chip dryrun to keep its compile time bounded."""

    in_channels: int = 1
    encoder_stages: tuple = tuple(ENCODER_STAGES)
    decoder_deconvs: tuple = tuple(DECODER_DECONVS)
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def predict(self, batch: Dict, train: bool = True
                ) -> Tuple[jnp.ndarray, Dict]:
        inputs = batch["observed_data"].astype(self.dtype) + 0.5
        b, t_in, h, w, cch = inputs.shape
        n_out = batch["tp_to_predict"].shape[0]
        lrelu = lambda v: jax.nn.leaky_relu(v, negative_slope=0.2)

        # ---- encoder: per stage conv (b·t) then ConvLSTM scan ---------
        x = inputs
        states = []
        for si, ((f_out, k, s), feats) in enumerate(self.encoder_stages):
            bt = x.shape[0] * x.shape[1]
            flat = x.reshape((bt,) + x.shape[2:])
            flat = lrelu(nn.Conv(f_out, (k, k), strides=(s, s), padding=1,
                                 dtype=self.dtype,
                                 param_dtype=self.param_dtype,
                                 name=f"enc_conv_{si}")(flat))
            x = flat.reshape((b, t_in) + flat.shape[1:])
            cell = ConvLSTMCell(num_features=feats, dtype=self.dtype,
                                param_dtype=self.param_dtype,
                                name=f"enc_cell_{si}")
            zero = jnp.zeros(x.shape[:1] + x.shape[2:4] + (feats,),
                             self.dtype)
            carry, hs = _scan_cell(cell, (zero, zero), x, t_in)
            states.append(carry)
            x = hs

        # ---- forecaster: reversed states, free-run + deconvs ----------
        states = states[::-1]
        y = None
        for si, (carry, feats) in enumerate(
                zip(states, [st[1] for st in self.encoder_stages][::-1])):
            cell = ConvLSTMCell(num_features=feats, dtype=self.dtype,
                                param_dtype=self.param_dtype,
                                name=f"dec_cell_{si}")
            _, hs = _scan_cell(cell, carry, y, n_out)
            bt = hs.shape[0] * hs.shape[1]
            flat = hs.reshape((bt,) + hs.shape[2:])
            if si < len(self.decoder_deconvs):
                f_out, k, s = self.decoder_deconvs[si]
                flat = lrelu(nn.ConvTranspose(
                    f_out, (k, k), strides=(s, s), padding="SAME",
                    dtype=self.dtype, param_dtype=self.param_dtype,
                    name=f"dec_deconv_{si}")(flat))
                y = flat.reshape((b, n_out) + flat.shape[1:])
            else:
                # final head: deconv to full res then 16→out convs
                flat = lrelu(nn.ConvTranspose(
                    64, (4, 4), strides=(2, 2), padding="SAME",
                    dtype=self.dtype, param_dtype=self.param_dtype,
                    name="head_deconv")(flat))
                flat = lrelu(nn.Conv(16, (3, 3), padding=1,
                                     dtype=self.dtype,
                                     param_dtype=self.param_dtype,
                                     name="head_conv_0")(flat))
                flat = nn.Conv(self.in_channels, (1, 1), dtype=self.dtype,
                               param_dtype=self.param_dtype,
                               name="head_conv_1")(flat)
                y = flat.reshape((b, n_out) + flat.shape[1:])

        pred = jax.nn.sigmoid(y)
        return pred.astype(jnp.float32), {}

    def loss(self, batch: Dict, train: bool = True):
        pred, _aux = self.predict(batch, train=train)
        target = batch["data_to_predict"].astype(jnp.float32) + 0.5
        mse = jnp.mean(jnp.square(pred - target))
        return mse, ({"loss": mse, "mse": mse}, pred)
