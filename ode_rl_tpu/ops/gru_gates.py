"""Fused ConvGRU gate kernels (the pointwise tails around the gate convs).

SURVEY §7 hard-part #4: the ConvGRU step is
    gates = GroupNorm(conv_g([x, h]));  z, r = σ(split(gates))
    cand  = tanh(GroupNorm(conv_c([x, r·h])))
    h'    = (1 − z)·h + z·cand
The two convolutions must stay separate (the candidate conv consumes
r·h), so the fusion opportunity is the two pointwise tails:

  * fused_gru_gates: GroupNorm + sigmoid on the gate conv output, plus
    the r·h product — one VMEM pass instead of ~6 HBM round trips;
  * fused_gru_blend: GroupNorm + tanh + convex blend — one more pass.

GroupNorm statistics are per (sample, group) over (H, W, C/G), computed
in fp32 inside the kernel. The XLA path is the numerics reference; XLA
already fuses most of this, so the kernels are profile-gated (the
ConvGRUCell uses them only when ops.common.use_pallas() is true and the
feature map fits VMEM).

Round-2 re-measurement (differential chained timing — immune to the
dispatch artifacts that skewed round-1 numbers; see
scripts/profile_step.py): full ConvGRU step at (128,16,16,64) bf16 on
v5e is 366 µs with XLA gates vs 478 µs with these kernels (1.31×
slower) — same conclusion as ops/conv3x3.py: XLA's fusion wins on these
shapes, so the Pallas path stays default-off with its numbers recorded.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ode_rl_tpu.ops.common import use_pallas

# Per-sample feature maps must fit VMEM (~16 MB/core) alongside the
# pipeline's double buffers; beyond this the XLA fusion path wins anyway.
_VMEM_BUDGET = 6 * 1024 * 1024


def _feature_bytes(x) -> int:
    return int(np.prod(x.shape[1:])) * x.dtype.itemsize


def _groupnorm_f32(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
                   groups: int, eps: float = 1e-5) -> jnp.ndarray:
    """(H, W, C) GroupNorm in fp32 (per-group stats over H, W, C/G).

    Mosaic-safe formulation: the usual ``reshape(..., G, C/G)`` splits the
    lane dimension, which the TPU vector layout can't express — instead
    per-group stats are gathered with a one-hot (C, G) matmul (E[x²]−E[x]²
    one-pass moments, the same formula flax GroupNorm uses).
    """
    h, w, c = x.shape
    cs = c // groups
    xf = x.astype(jnp.float32)
    # (C, G) one-hot group membership.
    ch_ids = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 0)
    g_ids = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 1)
    onehot = (ch_ids // cs == g_ids).astype(jnp.float32)

    s1 = jnp.sum(xf, axis=(0, 1))[None, :]          # (1, C)
    s2 = jnp.sum(xf * xf, axis=(0, 1))[None, :]     # (1, C)
    n = h * w * cs
    g_mean = jnp.dot(s1, onehot, preferred_element_type=jnp.float32) / n
    g_mean2 = jnp.dot(s2, onehot, preferred_element_type=jnp.float32) / n
    g_var = jnp.maximum(g_mean2 - g_mean * g_mean, 0.0)
    mean_c = jnp.dot(g_mean, onehot.T,
                     preferred_element_type=jnp.float32)[0]   # (C,)
    var_c = jnp.dot(g_var, onehot.T,
                    preferred_element_type=jnp.float32)[0]    # (C,)
    norm = (xf - mean_c) * jax.lax.rsqrt(var_c + eps)
    return norm * scale.astype(jnp.float32) + bias.astype(jnp.float32)


# ------------------------------ gates ------------------------------------

def _groupnorm_reshape_f32(x, scale, bias, groups, eps=1e-5):
    """Batched (B,H,W,C) GroupNorm via reshape — the fast formulation
    outside Pallas (reshapes are free in XLA; Mosaic can't lane-split)."""
    b, h, w, c = x.shape
    xf = x.astype(jnp.float32).reshape(b, h, w, groups, c // groups)
    mean = jnp.mean(xf, axis=(1, 2, 4), keepdims=True)
    mean2 = jnp.mean(xf * xf, axis=(1, 2, 4), keepdims=True)
    var = jnp.maximum(mean2 - mean * mean, 0.0)
    norm = ((xf - mean) * jax.lax.rsqrt(var + eps)).reshape(b, h, w, c)
    return norm * scale.astype(jnp.float32) + bias.astype(jnp.float32)


def _gates_xla(gates_raw, h, scale, bias, groups):
    gn = _groupnorm_reshape_f32(gates_raw, scale, bias, groups)
    z, r = jnp.split(jax.nn.sigmoid(gn), 2, axis=-1)
    z = z.astype(h.dtype)
    r = r.astype(h.dtype)
    return z, r * h


def _gates_kernel(g_ref, h_ref, scale_ref, bias_ref, z_ref, rh_ref, *,
                  groups):
    gn = _groupnorm_f32(g_ref[0], scale_ref[:], bias_ref[:], groups)
    sig = jax.nn.sigmoid(gn)
    c = sig.shape[-1] // 2
    z_ref[0] = sig[..., :c].astype(z_ref.dtype)
    rh_ref[0] = (sig[..., c:] * h_ref[0].astype(jnp.float32)).astype(
        rh_ref.dtype)


@functools.lru_cache(maxsize=None)
def _gates_with_vjp(groups: int, interpret: bool):
    """Pallas forward, backward from AD of the XLA formula."""

    @jax.custom_vjp
    def op(gates_raw, h, scale, bias):
        return _gates_pallas(gates_raw, h, scale, bias, groups, interpret)

    def fwd(gates_raw, h, scale, bias):
        return op(gates_raw, h, scale, bias), (gates_raw, h, scale, bias)

    def bwd(res, g):
        _, vjp = jax.vjp(
            lambda *a: tuple(_gates_xla(*a, groups)), *res)
        return vjp(g)

    op.defvjp(fwd, bwd)
    return op


def fused_gru_gates(gates_raw: jnp.ndarray, h: jnp.ndarray,
                    scale: jnp.ndarray, bias: jnp.ndarray, groups: int,
                    impl: str = "auto") -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(B,H,W,2C) raw gate conv output → (z, r·h), each (B,H,W,C)."""
    if impl == "xla" or (impl == "auto" and not use_pallas()):
        return _gates_xla(gates_raw, h, scale, bias, groups)
    if impl == "auto" and _feature_bytes(gates_raw) > _VMEM_BUDGET:
        return _gates_xla(gates_raw, h, scale, bias, groups)
    return _gates_with_vjp(groups, impl == "interpret")(
        gates_raw, h, scale, bias)


def _gates_pallas(gates_raw, h, scale, bias, groups, interpret):
    b, hh, ww, c2 = gates_raw.shape
    c = c2 // 2
    kernel = functools.partial(_gates_kernel, groups=groups)
    z, rh = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, hh, ww, c2), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hh, ww, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, hh, ww, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hh, ww, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, hh, ww, c), h.dtype),
            jax.ShapeDtypeStruct((b, hh, ww, c), h.dtype),
        ),
        interpret=interpret,
    )(gates_raw, h, scale, bias)
    return z, rh


# ------------------------------ blend ------------------------------------

def _blend_xla(cand_raw, z, h, scale, bias, groups):
    gn = _groupnorm_reshape_f32(cand_raw, scale, bias, groups)
    cand = jnp.tanh(gn).astype(h.dtype)
    zc = z.astype(h.dtype)
    return (1.0 - zc) * h + zc * cand


def _blend_kernel(c_ref, z_ref, h_ref, scale_ref, bias_ref, out_ref, *,
                  groups):
    gn = _groupnorm_f32(c_ref[0], scale_ref[:], bias_ref[:], groups)
    cand = jnp.tanh(gn)
    z = z_ref[0].astype(jnp.float32)
    h = h_ref[0].astype(jnp.float32)
    out_ref[0] = ((1.0 - z) * h + z * cand).astype(out_ref.dtype)


@functools.lru_cache(maxsize=None)
def _blend_with_vjp(groups: int, interpret: bool):
    @jax.custom_vjp
    def op(cand_raw, z, h, scale, bias):
        return _blend_pallas(cand_raw, z, h, scale, bias, groups, interpret)

    def fwd(cand_raw, z, h, scale, bias):
        return op(cand_raw, z, h, scale, bias), (cand_raw, z, h, scale, bias)

    def bwd(res, g):
        _, vjp = jax.vjp(lambda *a: _blend_xla(*a, groups), *res)
        return vjp(g)

    op.defvjp(fwd, bwd)
    return op


def fused_gru_blend(cand_raw: jnp.ndarray, z: jnp.ndarray, h: jnp.ndarray,
                    scale: jnp.ndarray, bias: jnp.ndarray, groups: int,
                    impl: str = "auto") -> jnp.ndarray:
    """(B,H,W,C) raw candidate conv output + gate z + state h → h_next."""
    if impl == "xla" or (impl == "auto" and not use_pallas()):
        return _blend_xla(cand_raw, z, h, scale, bias, groups)
    if impl == "auto" and _feature_bytes(cand_raw) > _VMEM_BUDGET:
        return _blend_xla(cand_raw, z, h, scale, bias, groups)
    return _blend_with_vjp(groups, impl == "interpret")(
        cand_raw, z, h, scale, bias)


def _blend_pallas(cand_raw, z, h, scale, bias, groups, interpret):
    b, hh, ww, c = cand_raw.shape
    kernel = functools.partial(_blend_kernel, groups=groups)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, hh, ww, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hh, ww, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hh, ww, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, hh, ww, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hh, ww, c), h.dtype),
        interpret=interpret,
    )(cand_raw, z, h, scale, bias)
