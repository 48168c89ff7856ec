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


def _vmem_params(*block_bytes: float) -> pltpu.CompilerParams:
    """Raise the Mosaic scoped-VMEM cap when the resident blocks plus
    double-buffering exceed the 16 MB default. FlowNetC at the chairs
    resolution (384×512 → 48×64×256 features, padded window 88×104×256)
    needs ~25 MB and OOM'd under the default; v5e has 128 MB of VMEM, so
    sizing the cap to the actual footprint (2× for pipelining, capped at
    100 MB) keeps the kernel legal at every resolution the reference
    trains at."""
    need = int(2.2 * sum(block_bytes))
    return pltpu.CompilerParams(
        vmem_limit_bytes=min(100 * 1024 * 1024, max(16 * 1024 * 1024, need)))


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
    esz = jnp.dtype(f1.dtype).itemsize
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
        compiler_params=_vmem_params(h * w * c * esz, hp * wp * c * esz,
                                     n_disp * h * w * esz),
        interpret=interpret,
    )(f1, f2p)
    return jnp.moveaxis(out.reshape(b, n_disp * n_disp, h, w), 1, -1)


def _bwd_f1_kernel(g_ref, f2p_ref, out_ref, *, h, w, c, n_disp, stride):
    # grad_f1[y,x,c] = Σ_{dy,dx} g[dy,dx,y,x] · f2p[y+dy, x+dx, c] / C.
    # One program per (batch, dy); the output block is revisited across
    # the minor dy axis and accumulated in place (init at iy==0).
    iy = pl.program_id(1)
    dy = iy * stride

    @pl.when(iy == 0)
    def _():
        out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)

    acc = out_ref[0].astype(jnp.float32)
    for j in range(n_disp):
        dx = j * stride
        win = f2p_ref[0, pl.ds(dy, h), dx:dx + w, :].astype(jnp.float32)
        gj = g_ref[0, 0, j].astype(jnp.float32)
        acc = acc + gj[..., None] * win * (1.0 / c)
    out_ref[0] = acc.astype(out_ref.dtype)


def _bwd_f2_kernel(g_ref, f1_ref, out_ref, *, h, w, c, n_disp, stride):
    # grad_f2p[y+dy, x+dx, c] += g[dy,dx,y,x] · f1[y,x,c] / C — the
    # scatter-into-shifted-windows dual of the forward's gather; windows
    # overlap, so the unrolled dx loop reads-modifies-writes the block.
    iy = pl.program_id(1)
    dy = iy * stride

    @pl.when(iy == 0)
    def _():
        out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)

    f1 = f1_ref[0].astype(jnp.float32) * (1.0 / c)
    for j in range(n_disp):
        dx = j * stride
        gj = g_ref[0, 0, j].astype(jnp.float32)
        cur = out_ref[0, pl.ds(dy, h), dx:dx + w, :].astype(jnp.float32)
        out_ref[0, pl.ds(dy, h), dx:dx + w, :] = (
            cur + gj[..., None] * f1).astype(out_ref.dtype)


def _correlation_bwd_pallas(f1, f2, g_nhwc, max_displacement: int,
                            stride: int, interpret: bool = False):
    """Hand-written backward, mirroring the reference's two CUDA backward
    kernels (correlation_cuda_kernel.cu backward0/backward1). AD of the
    XLA formula is a sequential 441-iteration lax.map — measured to
    dominate the whole FlowNetC train step (fwd 2.8 ms vs step 40 ms at
    64², b=64); these kernels walk the same displacement grid as the
    forward with both operands VMEM-resident."""
    b, h, w, c = f1.shape
    d = max_displacement
    n_disp = 2 * d // stride + 1
    f2p = jnp.pad(f2, ((0, 0), (d, d), (d, d), (0, 0)))
    hp, wp = h + 2 * d, w + 2 * d
    # NHWC cotangent → displacement-major (B, Dy, Dx, H, W), the forward's
    # kernel-side layout.
    g = jnp.moveaxis(g_nhwc, -1, 1).reshape(b, n_disp, n_disp, h, w)
    esz = jnp.dtype(f1.dtype).itemsize

    g_spec = pl.BlockSpec((1, 1, n_disp, h, w),
                          lambda ib, iy: (ib, iy, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    # The unrolled dx loop keeps one fp32 (h, w, c) window temp live per
    # iteration (Mosaic rejects a fori_loop here — dynamic slices on the
    # sublane dim don't lower, same constraint the forward documents), so
    # the stack need scales with n_disp; measured 63.8 MB at the chairs
    # shape where the resident blocks alone are ~13 MB.
    unroll_tmp = n_disp * h * w * c * 4
    k1 = functools.partial(_bwd_f1_kernel, h=h, w=w, c=c, n_disp=n_disp,
                           stride=stride)
    grad_f1 = pl.pallas_call(
        k1, grid=(b, n_disp),
        in_specs=[g_spec,
                  pl.BlockSpec((1, hp, wp, c), lambda ib, iy: (ib, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, h, w, c), lambda ib, iy: (ib, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), f1.dtype),
        compiler_params=_vmem_params(n_disp * h * w * esz,
                                     hp * wp * c * esz, h * w * c * esz,
                                     unroll_tmp),
        interpret=interpret,
    )(g, f2p)

    k2 = functools.partial(_bwd_f2_kernel, h=h, w=w, c=c, n_disp=n_disp,
                           stride=stride)
    grad_f2p = pl.pallas_call(
        k2, grid=(b, n_disp),
        in_specs=[g_spec,
                  pl.BlockSpec((1, h, w, c), lambda ib, iy: (ib, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, hp, wp, c), lambda ib, iy: (ib, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hp, wp, c), f1.dtype),
        compiler_params=_vmem_params(n_disp * h * w * esz,
                                     h * w * c * esz, hp * wp * c * esz,
                                     unroll_tmp),
        interpret=interpret,
    )(g, f1)
    return grad_f1, grad_f2p[:, d:d + h, d:d + w, :]


@functools.lru_cache(maxsize=None)
def _corr_with_vjp(max_displacement: int, stride: int, interpret: bool):
    """Pallas forward + hand-written Pallas backward (pallas_call itself
    is not differentiable; the reference hand-writes two CUDA backward
    kernels, correlation_cuda_kernel.cu:151-320 — ours are
    _bwd_f1_kernel/_bwd_f2_kernel, pinned against AD of the XLA formula
    in tests/test_ops.py)."""

    @jax.custom_vjp
    def op(f1, f2):
        return _correlation_pallas(f1, f2, max_displacement, stride,
                                   interpret=interpret)

    def fwd(f1, f2):
        return op(f1, f2), (f1, f2)

    def bwd(res, g):
        f1, f2 = res
        b, h, w, c = f1.shape
        n_disp = 2 * max_displacement // stride + 1
        # Beyond-chairs shapes where the unrolled-window stack can't fit
        # VMEM fall back to AD of the XLA formula (slow but always legal).
        if n_disp * h * w * c * 4 > 90 * 1024 * 1024:
            _, vjp = jax.vjp(
                lambda a, x: _correlation_xla(a, x, max_displacement,
                                              stride), f1, f2)
            return vjp(g)
        return _correlation_bwd_pallas(f1, f2, g, max_displacement, stride,
                                       interpret=interpret)

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
