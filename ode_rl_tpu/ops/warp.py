"""Bilinear warping ops: grid_sample and resample2d.

Capability parity with two reference native paths that are the same math:
  * resample2d_cuda — backward-warp ``input1`` by a pixel-displacement
    flow field (/root/reference/flownet2-pytorch/networks/
    resample2d_package/resample2d_kernel.cu:16, bilinear, border clamp);
  * ``F.grid_sample(..., padding_mode="border")`` as used by VidODE's
    recursive warping (/root/reference/models/VidODE.py:182 and
    /root/reference/Vid-ODE/models/conv_odegru.py) with normalized grids
    (align_corners=False semantics, PyTorch's default).

TPU-first: arbitrary per-pixel sampling is a gather; XLA lowers it to
native TPU gathers and fuses the weight arithmetic, and reverse-mode AD
yields the scatter-add backward automatically (the reference hand-writes
both CUDA backward kernels). A Pallas version would have to emulate
per-pixel gathers with scalar loops — strictly worse than the XLA
lowering on this access pattern — so gather stays in XLA by design; the
Pallas budget goes to the ops with regular access (correlation,
channelnorm, gate fusion).
"""

from __future__ import annotations

import jax.numpy as jnp


def _bilinear_gather(image: jnp.ndarray, ix: jnp.ndarray, iy: jnp.ndarray
                     ) -> jnp.ndarray:
    """Sample (B,H,W,C) image at continuous pixel coords (B,Ho,Wo),
    border-clamped bilinear."""
    b, h, w, c = image.shape
    ix = jnp.clip(ix, 0.0, w - 1.0)
    iy = jnp.clip(iy, 0.0, h - 1.0)
    x0 = jnp.floor(ix)
    y0 = jnp.floor(iy)
    x1 = jnp.minimum(x0 + 1.0, w - 1.0)
    y1 = jnp.minimum(y0 + 1.0, h - 1.0)
    wx = (ix - x0)[..., None]
    wy = (iy - y0)[..., None]

    x0i, x1i = x0.astype(jnp.int32), x1.astype(jnp.int32)
    y0i, y1i = y0.astype(jnp.int32), y1.astype(jnp.int32)
    bidx = jnp.arange(b)[:, None, None]

    v00 = image[bidx, y0i, x0i]
    v01 = image[bidx, y0i, x1i]
    v10 = image[bidx, y1i, x0i]
    v11 = image[bidx, y1i, x1i]
    top = v00 * (1.0 - wx) + v01 * wx
    bot = v10 * (1.0 - wx) + v11 * wx
    return top * (1.0 - wy) + bot * wy


def grid_sample(image: jnp.ndarray, grid: jnp.ndarray,
                padding: str = "border",
                align_corners: bool = False) -> jnp.ndarray:
    """Sample (B,H,W,C) at normalized grid (B,Ho,Wo,2) with (gx, gy) in
    [-1, 1]; matches torch.nn.functional.grid_sample conventions."""
    if padding != "border":
        raise NotImplementedError("only border padding (the reference's "
                                  "only used mode)")
    b, h, w, c = image.shape
    gx, gy = grid[..., 0], grid[..., 1]
    if align_corners:
        ix = (gx + 1.0) * (w - 1.0) / 2.0
        iy = (gy + 1.0) * (h - 1.0) / 2.0
    else:
        ix = ((gx + 1.0) * w - 1.0) / 2.0
        iy = ((gy + 1.0) * h - 1.0) / 2.0
    return _bilinear_gather(image, ix, iy)


def resample2d(image: jnp.ndarray, flow: jnp.ndarray,
               mode: str = "bilinear") -> jnp.ndarray:
    """Backward warp: out[y, x] = image[y + v, x + u] for flow (B,H,W,2)
    = (u, v) in pixels, border-clamped — the resample2d_cuda contract."""
    if mode != "bilinear":
        raise NotImplementedError("bilinear only (reference default)")
    b, h, w, c = image.shape
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=flow.dtype),
                          jnp.arange(w, dtype=flow.dtype), indexing="ij")
    ix = xs[None] + flow[..., 0]
    iy = ys[None] + flow[..., 1]
    return _bilinear_gather(image, ix, iy)
