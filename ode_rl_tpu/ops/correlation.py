"""correlation: FlowNetC local cost volume.

Capability parity with the reference's correlation_cuda
(/root/reference/flownet2-pytorch/networks/correlation_package/
correlation_cuda_kernel.cu:74-149): for each pixel and each displacement
(tx, ty) with |t| ≤ max_displacement sampled every ``stride2`` pixels,
the channel-mean dot product of the two feature maps
(kernel_size=1, stride1=1 — the parameters FlowNetC actually uses,
/root/reference/flownet2-pytorch/networks/FlowNetC.py:28-31).
Output is (B, H, W, D²) with D = 2·max_displacement/stride2 + 1 (= 441
channels for FlowNetC), displacement-major exactly like the CUDA op.

TPU-first: the access pattern is regular (shifted windows), so the
Pallas kernel keeps both feature maps resident in VMEM and walks the
displacement grid as the minor grid axis — each (b, disp) program is one
VPU elementwise-multiply + channel reduction over a dynamically sliced
window, with zero HBM re-fetch of the inputs across displacements. The
XLA path (scan over displacements + dynamic slices) is the numerics
reference and CPU fallback.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ode_rl_tpu.ops.common import use_pallas


def _correlation_xla(f1: jnp.ndarray, f2: jnp.ndarray,
                     max_displacement: int, stride: int) -> jnp.ndarray:
    b, h, w, c = f1.shape
    d = max_displacement
    n_disp = 2 * d // stride + 1
    f2p = jnp.pad(f2, ((0, 0), (d, d), (d, d), (0, 0)))

    def one_disp(i):
        dy = (i // n_disp) * stride
        dx = (i % n_disp) * stride
        win = jax.lax.dynamic_slice(f2p, (0, dy, dx, 0), (b, h, w, c))
        return jnp.mean(f1 * win, axis=-1)

    out = jax.lax.map(one_disp, jnp.arange(n_disp * n_disp))  # (D², B, H, W)
    return jnp.moveaxis(out, 0, -1)


def _corr_kernel(f1_ref, f2p_ref, out_ref, *, h, w, n_disp, stride):
    # One program per (batch, dy): the H offset is a dynamic slice (H is
    # the untiled dim of the NHWC memref, so dynamic indices are free);
    # the W offsets are a static unrolled loop (sublane-dim slices must be
    # statically known on TPU).
    iy = pl.program_id(1)
    dy = iy * stride
    f1 = f1_ref[0].astype(jnp.float32)
    for j in range(n_disp):
        dx = j * stride
        win = f2p_ref[0, pl.ds(dy, h), dx:dx + w, :].astype(jnp.float32)
        out_ref[0, 0, j] = jnp.mean(f1 * win, axis=-1).astype(out_ref.dtype)


def _correlation_pallas(f1: jnp.ndarray, f2: jnp.ndarray,
                        max_displacement: int, stride: int,
                        interpret: bool = False) -> jnp.ndarray:
    b, h, w, c = f1.shape
    d = max_displacement
    n_disp = 2 * d // stride + 1
    f2p = jnp.pad(f2, ((0, 0), (d, d), (d, d), (0, 0)))
    hp, wp = h + 2 * d, w + 2 * d

    kernel = functools.partial(_corr_kernel, h=h, w=w, n_disp=n_disp,
                               stride=stride)
    # Displacement-major output (B, Dy, Dx, H, W): full H×W planes per
    # write satisfy the TPU tiling rule (last two block dims == array
    # dims) and match the CUDA op's channel-major layout; transposed to
    # NHWC below.
    out = pl.pallas_call(
        kernel,
        grid=(b, n_disp),
        in_specs=[
            # index maps constant along the displacement (minor) axis →
            # both feature maps stay resident in VMEM per batch element.
            pl.BlockSpec((1, h, w, c), lambda ib, iy: (ib, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hp, wp, c), lambda ib, iy: (ib, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, n_disp, h, w),
                               lambda ib, iy: (ib, iy, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_disp, n_disp, h, w), f1.dtype),
        interpret=interpret,
    )(f1, f2p)
    return jnp.moveaxis(out.reshape(b, n_disp * n_disp, h, w), 1, -1)


@functools.lru_cache(maxsize=None)
def _corr_with_vjp(max_displacement: int, stride: int, interpret: bool):
    """Pallas forward + XLA-derived backward (pallas_call itself is not
    differentiable; the reference hand-writes two CUDA backward kernels —
    here reverse-mode AD of the XLA formula supplies the exact gradient)."""

    @jax.custom_vjp
    def op(f1, f2):
        return _correlation_pallas(f1, f2, max_displacement, stride,
                                   interpret=interpret)

    def fwd(f1, f2):
        return op(f1, f2), (f1, f2)

    def bwd(res, g):
        f1, f2 = res
        _, vjp = jax.vjp(
            lambda a, b: _correlation_xla(a, b, max_displacement, stride),
            f1, f2)
        return vjp(g)

    op.defvjp(fwd, bwd)
    return op


def correlation(f1: jnp.ndarray, f2: jnp.ndarray,
                max_displacement: int = 20, stride: int = 2,
                impl: str = "auto") -> jnp.ndarray:
    """(B,H,W,C) × (B,H,W,C) → (B,H,W,D²) channel-mean cost volume."""
    if f1.shape != f2.shape:
        raise ValueError(f"shape mismatch {f1.shape} vs {f2.shape}")
    if impl == "xla" or (impl == "auto" and not use_pallas()):
        return _correlation_xla(f1, f2, max_displacement, stride)
    return _corr_with_vjp(max_displacement, stride,
                          impl == "interpret")(f1, f2)
