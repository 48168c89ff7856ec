"""channelnorm: per-pixel L2 norm across channels → 1-channel map.

Capability parity with the reference's channelnorm_cuda
(/root/reference/flownet2-pytorch/networks/channelnorm_package/
channelnorm_kernel.cu:19,64 — forward computes
``sqrt(sum_c x[c]^2)`` per pixel; used to feed flow magnitude into the
FlowNet2 fusion stage, /root/reference/flownet2-pytorch/models.py:49).

On TPU this is a bandwidth-bound channel reduction; the Pallas kernel
streams NHWC rows through VMEM and reduces on the VPU in one pass. The
XLA path is the numerics reference (and is what XLA would fuse anyway —
the named op exists for API parity and as the simplest Pallas exemplar).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ode_rl_tpu.ops.common import use_pallas


def _channelnorm_xla(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.sqrt(jnp.sum(jnp.square(x.astype(jnp.float32)),
                            axis=-1, keepdims=True)).astype(x.dtype)


def _kernel(x_ref, out_ref):
    x = x_ref[:].astype(jnp.float32)
    out_ref[:] = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True)).astype(
        out_ref.dtype)


def _channelnorm_pallas(x: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    b, h, w, c = x.shape
    return pl.pallas_call(
        _kernel,
        grid=(b,),
        in_specs=[pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, h, w, 1), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, 1), x.dtype),
        interpret=interpret,
    )(x)


import functools


@functools.lru_cache(maxsize=None)
def _cn_op(mode: str):
    """channelnorm with a hand-written backward (the reference hand-writes
    the CUDA backward too, channelnorm_kernel.cu:64): d norm/dx = x/norm,
    made safe at norm==0 where plain AD of sqrt(sum x²) yields 0/0 = NaN.
    That case is real, not theoretical: FlowNet2's stacking feeds
    brightness-error diffs through channelnorm (flownets.py:268,320) and
    synthetic MNIST frames have exactly-zero backgrounds — unguarded AD
    NaN'd the whole stacked-FlowNet2 training run. The subgradient 0 is
    used at x=0 (norm clamped away from zero; x·g/max(norm,eps) → 0)."""

    def _forward(x):
        if mode == "xla":
            return _channelnorm_xla(x)
        return _channelnorm_pallas(x, interpret=(mode == "interpret"))

    @jax.custom_vjp
    def op(x):
        return _forward(x)

    def fwd(x):
        return op(x), x

    def bwd(x, g):
        xf = x.astype(jnp.float32)
        norm = jnp.sqrt(jnp.sum(xf * xf, axis=-1, keepdims=True))
        gx = xf * (g.astype(jnp.float32) / jnp.maximum(norm, 1e-12))
        return (gx.astype(x.dtype),)

    op.defvjp(fwd, bwd)
    return op


def channelnorm(x: jnp.ndarray, impl: str = "auto") -> jnp.ndarray:
    """(B, H, W, C) → (B, H, W, 1) per-pixel L2 norm over channels."""
    if impl == "xla" or (impl == "auto" and not use_pallas()):
        return _cn_op("xla")(x)
    return _cn_op("interpret" if impl == "interpret" else "pallas")(x)
