"""Pallas implicit-im2col 3×3 SAME conv — measured, and DEFAULT-OFF.

Built to attack the ODE-field hot op ((B,16,16,64)→64, ~300 convs/step
through the dopri5 decode). Honest result (v5e-1, differential
chained-op timing — single-op timing is meaningless through the remote
dispatch tunnel, where block_until_ready does not await completion):

  | impl | µs/conv | TF/s |
  |---|---|---|
  | XLA native conv          | 15.6–17.5 | 138–155 (≈70–78% of bf16 peak) |
  | this kernel (VMEM im2col + 1 matmul) | 48.8 | 50 |
  | tap-accumulation variant (9 K=64 matmuls) | 64.6 | 37 |

XLA's conv at this shape is already near speed-of-light; the VMEM patch
build costs more in relayouts than the HBM traffic it saves. The kernel
therefore ships **opt-in** (ODE_RL_TPU_PALLAS_CONV=1) as a documented
experiment, and ``conv3x3_same`` dispatches to XLA by default — the
same profile-gated honesty policy as ops/gru_gates.py. The earlier
"~24 TF/s XLA conv" reading (HANDOFF round 1) was a dispatch-side
measurement artifact, not compute time.

Semantics match ``nn.Conv(features, (3,3), padding=1)`` on NHWC inputs:
out = conv(x, w) + b, fp32 accumulation, output in the input dtype.
Backward: dx as the same kernel applied to the padded cotangent with the
spatially-flipped, channel-transposed weights; dw as a Pallas
tap-stacked-GEMM accumulated across batch tiles (TPU grids run
sequentially, so cross-tile accumulation into the output ref is safe);
db in XLA.

Used by nn/conv_stacks.ConvNet (the ODE dynamics field of
ODEConvGRU/VidODE — reference create_convnet,
/root/reference/helpers/utils.py:158-183).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ode_rl_tpu.ops.common import use_pallas

# Per-buffer VMEM budget for the in-kernel patch matrix (bytes); beyond
# this the XLA path wins on pipelining anyway.
_PATCH_BUDGET = 4 * 1024 * 1024


def _tile_b(b: int, h: int, w: int, cin: int, itemsize: int) -> int:
    per_sample = h * w * 9 * cin * itemsize
    best = 0
    for tb in range(1, b + 1):
        if b % tb == 0 and tb * per_sample <= _PATCH_BUDGET:
            best = tb
    return best


def eligible(x: jnp.ndarray, kernel: jnp.ndarray) -> bool:
    """Pallas path: opt-in (XLA wins on this op — see module docstring),
    bf16 NHWC, 3×3 kernel, shapes the VMEM plan fits."""
    import os
    if not os.environ.get("ODE_RL_TPU_PALLAS_CONV"):
        return False
    if not use_pallas():
        return False
    if x.ndim != 4 or kernel.shape[:2] != (3, 3):
        return False
    if x.dtype != jnp.bfloat16:
        return False  # fp32 keeps XLA's higher-precision conv path
    b, h, w, cin = x.shape
    cout = kernel.shape[3]
    if cin % 8 or cout % 8 or h < 3 or w < 3:
        return False
    # The backward's dx pass runs _pallas_fwd on the cotangent, whose
    # channel count is cout — both tile plans must fit VMEM, else the
    # grid computation divides by zero at trace time.
    return _tile_b(b, h, w, cin, 2) > 0 and _tile_b(b, h, w, cout, 2) > 0


def _fwd_kernel(xp_ref, w_ref, out_ref, *, tb, h, w, cin, cout):
    # xp: (TB, H+2, W+2, Cin) pre-padded; w: (9*Cin, Cout); out: (TB,H,W,Cout)
    cols = []
    for dy in range(3):
        for dx in range(3):
            sl = xp_ref[:, dy:dy + h, dx:dx + w, :]
            cols.append(sl.reshape(tb * h * w, cin))
    patches = jnp.concatenate(cols, axis=1)          # (TB·H·W, 9·Cin)
    out = jnp.dot(patches, w_ref[:], preferred_element_type=jnp.float32)
    out_ref[:] = out.reshape(tb, h, w, cout).astype(out_ref.dtype)


def _wgrad_kernel(xp_ref, g_ref, dw_ref, *, tb, h, w, cin, cout):
    # Accumulate (9·Cin, Cout) over sequential batch-tile grid steps.
    i = pl.program_id(0)
    cols = []
    for dy in range(3):
        for dx in range(3):
            sl = xp_ref[:, dy:dy + h, dx:dx + w, :]
            cols.append(sl.reshape(tb * h * w, cin))
    patches = jnp.concatenate(cols, axis=1)
    g = g_ref[:].reshape(tb * h * w, cout)
    acc = jax.lax.dot_general(
        patches, g, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)           # (9·Cin, Cout)

    @pl.when(i == 0)
    def _():
        dw_ref[:] = acc

    @pl.when(i > 0)
    def _():
        dw_ref[:] = dw_ref[:] + acc


def _pallas_fwd(x: jnp.ndarray, w2d: jnp.ndarray) -> jnp.ndarray:
    b, h, w, cin = x.shape
    cout = w2d.shape[1]
    tb = _tile_b(b, h, w, cin, x.dtype.itemsize)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    kern = functools.partial(_fwd_kernel, tb=tb, h=h, w=w, cin=cin,
                             cout=cout)
    return pl.pallas_call(
        kern,
        grid=(b // tb,),
        in_specs=[
            pl.BlockSpec((tb, h + 2, w + 2, cin), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tb, h, w, cout), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, cout), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * w * 9 * cin * cout,
            bytes_accessed=x.size * x.dtype.itemsize
            + w2d.size * 2 + b * h * w * cout * 2,
            transcendentals=0),
    )(xp, w2d)


def _pallas_wgrad(x: jnp.ndarray, g: jnp.ndarray) -> jnp.ndarray:
    b, h, w, cin = x.shape
    cout = g.shape[3]
    tb = _tile_b(b, h, w, cin, x.dtype.itemsize)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    kern = functools.partial(_wgrad_kernel, tb=tb, h=h, w=w, cin=cin,
                             cout=cout)
    return pl.pallas_call(
        kern,
        grid=(b // tb,),
        in_specs=[
            pl.BlockSpec((tb, h + 2, w + 2, cin), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, h, w, cout), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((9 * cin, cout), jnp.float32),
    )(xp, g)


def _xla_conv(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    # Same contract as nn.Conv's lax conv: operands in the compute dtype
    # (MXU accumulates fp32 in hardware for bf16 operands).
    return jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype), window_strides=(1, 1),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


@jax.custom_vjp
def _conv3x3(x: jnp.ndarray, w2d: jnp.ndarray) -> jnp.ndarray:
    return _pallas_fwd(x, w2d)


def _conv3x3_fwd(x, w2d):
    return _pallas_fwd(x, w2d), (x, w2d)


def _conv3x3_bwd(res, g):
    x, w2d = res
    cin = x.shape[3]
    cout = w2d.shape[1]
    # dx: correlate the cotangent with the flipped, channel-transposed
    # kernel — itself a 3×3 SAME conv, so reuse the forward kernel.
    w4d = w2d.reshape(3, 3, cin, cout)
    w_t = jnp.flip(w4d, axis=(0, 1)).transpose(0, 1, 3, 2)  # (3,3,Cout,Cin)
    dx = _pallas_fwd(g, w_t.reshape(9 * cout, cin)).astype(x.dtype)
    dw = _pallas_wgrad(x, g).astype(w2d.dtype)
    return dx, dw


_conv3x3.defvjp(_conv3x3_fwd, _conv3x3_bwd)


def conv3x3_same(x: jnp.ndarray, kernel: jnp.ndarray,
                 bias: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """3×3 stride-1 SAME conv, NHWC × HWIO → NHWC.

    Dispatches to the VMEM implicit-im2col Pallas kernel when profitable
    (TPU, bf16, shapes within the VMEM plan), else to XLA. Numerics in
    both paths: bf16 MXU with fp32 accumulation, result cast to the
    input dtype; bias added in the input dtype (same as nn.Conv)."""
    if eligible(x, kernel):
        out = _conv3x3(x, kernel.reshape(9 * kernel.shape[2],
                                         kernel.shape[3]))
    else:
        out = _xla_conv(x, kernel)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out
