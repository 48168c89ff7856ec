"""Convolutional GRU cell and scan drivers.

Capability parity with the reference's ConvGRUCell
(/root/reference/modules/ConvGRUCell.py:11-86): fused gates convolution
producing 2·hidden channels + GroupNorm (hidden/32 groups), candidate
convolution + GroupNorm, sigmoid/tanh gating, optional per-step mask
gating, and free-run mode (zero input) for decoders.

TPU-first: the reference unrolls a Python loop over timesteps launching
eager CUDA kernels per frame; here a single cell application is a pure
function and the time loop is ``lax.scan``, so XLA compiles one fused body
and the MXU sees batched NHWC convolutions. The elementwise gate math is
fused by XLA (a Pallas fused-gate kernel is available in ops/ for the
pointwise tail).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class _ConvParams(nn.Module):
    """Declares the exact ``{kernel, bias}`` params of an ``nn.Conv``
    without computing — the fused scan paths consume the kernel directly
    (sliced into its input-side and hidden-side channel blocks). Same
    module path + names ⇒ flax's path-derived param RNGs give
    bit-identical init, and existing checkpoints load unchanged."""

    features: int
    kernel_size: int
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, in_features: int):
        k = self.param(
            "kernel", nn.linear.default_kernel_init,
            (self.kernel_size, self.kernel_size, in_features, self.features),
            self.param_dtype)
        b = self.param("bias", nn.initializers.zeros_init(),
                       (self.features,), self.param_dtype)
        return k, b


def _conv_same(x, kernel, bias, dtype):
    """Exactly ``nn.Conv``'s lowering for the stride-1 SAME NHWC case."""
    from flax.linen.dtypes import promote_dtype

    x, kernel, bias = promote_dtype(x, kernel, bias, dtype=dtype)
    y = jax.lax.conv_general_dilated(
        x, kernel, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if bias is not None:
        y = y + bias.reshape((1,) * (y.ndim - 1) + (-1,))
    return y


class ConvGRUCell(nn.Module):
    """One ConvGRU step. State and input are NHWC.

    Both gate convolutions run over ``concat([x, h])``, which is linear
    in the input channels: ``conv(concat([x,h]), K) = conv(x, K[:,:,:cx])
    + conv(h, K[:,:,cx:]) + b``. The scan drivers below exploit this the
    way cuDNN RNNs do — ``project_x`` computes the input-side halves of
    ALL timesteps as one big batched conv on the MXU before the scan,
    and ``step_fused`` keeps only the hidden-side convs (half the FLOPs,
    and for free-run decoders the x-side conv disappears entirely) inside
    the sequential loop. ``__call__`` remains the unsplit single-step
    path, bit-equal to the previous nn.Conv-on-concat implementation."""

    hidden_dim: int
    kernel_size: int = 5
    groups_div: int = 32
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    # Profile-driven default (SURVEY §7 hard-part #4): the fused Pallas
    # gate kernels LOSE to plain XLA — re-measured round 2 with
    # dispatch-artifact-free differential timing: 478 µs vs 366 µs per
    # ConvGRU step at (128,16,16,64) on v5e (1.31× slower; the kernel
    # boundary between the two gate convs blocks XLA's conv-epilogue
    # fusion). XLA therefore stays the default; "auto"/"interpret"
    # select the Pallas path (ops/gru_gates).
    gate_impl: str = "xla"

    def setup(self):
        c = self.hidden_dim
        self.conv_gates = _ConvParams(2 * c, self.kernel_size,
                                      self.param_dtype)
        self.conv_cand = _ConvParams(c, self.kernel_size, self.param_dtype)
        ones = nn.initializers.ones
        zeros = nn.initializers.zeros
        self.gates_scale = self.param("gates_scale", ones, (2 * c,),
                                      self.param_dtype)
        self.gates_bias = self.param("gates_bias", zeros, (2 * c,),
                                     self.param_dtype)
        self.cand_scale = self.param("cand_scale", ones, (c,),
                                     self.param_dtype)
        self.cand_bias = self.param("cand_bias", zeros, (c,),
                                    self.param_dtype)

    def __call__(
        self,
        h: jnp.ndarray,
        x: Optional[jnp.ndarray] = None,
        mask: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """h: (B, H, W, hidden); x: (B, H, W, Cin) or None (free-run)."""
        from ode_rl_tpu.ops.gru_gates import fused_gru_blend, fused_gru_gates

        if x is None:
            # Free-run: the reference feeds explicit zeros of the input
            # width; an all-zero input contributes only the conv bias, so
            # we concatenate a zero tensor of the hidden width for shape
            # stability (input_dim == hidden_dim in every free-run use).
            x = jnp.zeros_like(h)
        c = self.hidden_dim
        cin = x.shape[-1] + h.shape[-1]
        gk, gb = self.conv_gates(cin)
        ck, cb = self.conv_cand(cin)
        groups_g = max(2 * c // self.groups_div, 1)
        groups_c = max(c // self.groups_div, 1)

        # Gate conv → fused GroupNorm+σ+(r·h) (one VMEM pass on TPU).
        combined = jnp.concatenate([x, h], axis=-1)
        gates_raw = _conv_same(combined, gk, gb, self.dtype)
        z, rh = fused_gru_gates(gates_raw, h, self.gates_scale,
                                self.gates_bias, groups_g,
                                impl=self.gate_impl)

        # Candidate conv → fused GroupNorm+tanh+convex-blend.
        combined_c = jnp.concatenate([x, rh], axis=-1)
        cand_raw = _conv_same(combined_c, ck, cb, self.dtype)
        h_next = fused_gru_blend(cand_raw, z, h, self.cand_scale,
                                 self.cand_bias, groups_c,
                                 impl=self.gate_impl)

        return self._apply_mask(h_next, h, mask)

    @staticmethod
    def _apply_mask(h_next, h, mask):
        if mask is not None:
            # Per-step mask gating: masked-out steps keep the old state
            # (reference ConvGRUCell mask path / Vid-ODE base_conv_gru).
            m = mask.reshape(mask.shape[0], 1, 1, 1).astype(h.dtype)
            h_next = m * h_next + (1.0 - m) * h
        return h_next

    def project_x(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Input-side halves of both gate convs, biases folded in.
        ``x``: (N, H, W, Cin) — callers flatten (B, T) into N so all
        timesteps run as one conv."""
        cin = x.shape[-1] + self.hidden_dim
        gk, gb = self.conv_gates(cin)
        ck, cb = self.conv_cand(cin)
        cx = x.shape[-1]
        return (_conv_same(x, gk[:, :, :cx], gb, self.dtype),
                _conv_same(x, ck[:, :, :cx], cb, self.dtype))

    def project_zero(self) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Free-run input projection: conv of zeros is just the bias
        (the x-side conv vanishes from the scan entirely)."""
        cin = 2 * self.hidden_dim      # free-run feeds hidden-width zeros
        _, gb = self.conv_gates(cin)
        _, cb = self.conv_cand(cin)
        return (jnp.asarray(gb, self.dtype).reshape(1, 1, 1, -1),
                jnp.asarray(cb, self.dtype).reshape(1, 1, 1, -1))

    def step_fused(
        self,
        h: jnp.ndarray,
        gx: jnp.ndarray,
        cx: jnp.ndarray,
        x_ch: int,
        mask: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """One step given precomputed input projections (gx, cx) from
        :meth:`project_x` / :meth:`project_zero`; only the hidden-side
        convs run here."""
        from ode_rl_tpu.ops.gru_gates import fused_gru_blend, fused_gru_gates

        c = self.hidden_dim
        cin = x_ch + c
        gk, _ = self.conv_gates(cin)
        ck, _ = self.conv_cand(cin)
        groups_g = max(2 * c // self.groups_div, 1)
        groups_c = max(c // self.groups_div, 1)

        gates_raw = gx + _conv_same(h, gk[:, :, x_ch:], None, self.dtype)
        z, rh = fused_gru_gates(gates_raw, h, self.gates_scale,
                                self.gates_bias, groups_g,
                                impl=self.gate_impl)
        cand_raw = cx + _conv_same(rh, ck[:, :, x_ch:], None, self.dtype)
        h_next = fused_gru_blend(cand_raw, z, h, self.cand_scale,
                                 self.cand_bias, groups_c,
                                 impl=self.gate_impl)
        return self._apply_mask(h_next, h, mask)


def convgru_scan(
    cell: ConvGRUCell,
    h0: jnp.ndarray,
    xs: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    reverse: bool = False,
    fused: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Scan a cell over time. xs: (B, T, H, W, C) → (hiddens (B,T,...), h_T).

    Must be called inside a parent flax module (shares one set of cell
    params across time via ``nn.scan``).

    ``fused=True`` (default) hoists the input-side gate convolutions of
    all T steps into one batched (B·T) conv before the scan and keeps
    only the hidden-side convs in the sequential loop — identical math
    up to the fp reassociation of splitting the channel reduction
    (pinned ≤1e-5 in tests/test_fast_rnn.py).
    """
    if fused:
        b, t = xs.shape[:2]
        x_ch = xs.shape[-1]
        gx, cx = cell.project_x(xs.reshape((b * t,) + xs.shape[2:]))
        gx = gx.reshape((b, t) + gx.shape[1:])
        cx = cx.reshape((b, t) + cx.shape[1:])
        scan = nn.scan(
            lambda c, h, inp: (c.step_fused(h, inp[0], inp[1], x_ch,
                                            inp[2]),) * 2,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=1,
            out_axes=1,
            reverse=reverse,
        )
        h_last, hs = scan(cell, h0, (gx, cx, mask))
        return hs, h_last
    scan = nn.scan(
        lambda c, h, xm: (c(h, xm[0], xm[1]),) * 2,
        variable_broadcast="params",
        split_rngs={"params": False},
        in_axes=1,
        out_axes=1,
        reverse=reverse,
    )
    h_last, hs = scan(cell, h0, (xs, mask))
    return hs, h_last


def convgru_freerun(
    cell: ConvGRUCell, h0: jnp.ndarray, n_steps: int, fused: bool = True
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Free-run the cell from h0 for n_steps with zero input.

    ``fused=True`` (default): a zero input contributes only the conv
    biases, so the x-side convs vanish from the scan entirely — each
    step runs HALF the conv FLOPs of the unfused path (the decoder
    regime of ConvGRU/S2VAE/S3VAE)."""
    if fused:
        gx, cx = cell.project_zero()
        x_ch = h0.shape[-1]
        scan = nn.scan(
            lambda c, h, _: (c.step_fused(h, gx, cx, x_ch),) * 2,
            variable_broadcast="params",
            split_rngs={"params": False},
            out_axes=1,
            length=n_steps,
        )
        h_last, hs = scan(cell, h0, None)
        return hs, h_last
    scan = nn.scan(
        lambda c, h, _: (c(h, None),) * 2,
        variable_broadcast="params",
        split_rngs={"params": False},
        out_axes=1,
        length=n_steps,
    )
    h_last, hs = scan(cell, h0, None)
    return hs, h_last
