"""Evaluation metrics in pure JAX: MSE, PSNR, SSIM.

Capability parity with the reference's test path
(/root/reference/train_test.py:107-142): per-frame MSE,
PSNR = 10·log10(1/MSE), and SSIM computed on ×255 frames with Gaussian
weights and no sample covariance (the skimage settings at
/root/reference/helpers/utils.py:254-271: gaussian_weights=True,
use_sample_covariance=False → 11×11 window, σ=1.5, K1=0.01, K2=0.03).

TPU-first: SSIM's windowed moments are depthwise convolutions, so the
whole eval computes on device inside the jitted eval step (the reference
round-trips every frame through skimage on the host).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


def mse(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.square(pred - target))


def psnr(pred: jnp.ndarray, target: jnp.ndarray, data_range: float = 1.0) -> jnp.ndarray:
    m = mse(pred, target)
    return 10.0 * jnp.log10(data_range**2 / jnp.maximum(m, 1e-12))


def _gaussian_kernel(truncate: float = 3.5, sigma: float = 1.5) -> np.ndarray:
    radius = int(truncate * sigma + 0.5)  # skimage: 11×11 for σ=1.5
    x = np.arange(-radius, radius + 1)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def _filter2d(img: jnp.ndarray, kernel1d: np.ndarray) -> jnp.ndarray:
    """Separable 'valid' Gaussian filter over (B, H, W, C)."""
    k = jnp.asarray(kernel1d)
    kh = k.reshape(1, -1, 1, 1, 1)  # (O=1, KH, KW=1, I=1 grouped)
    # Depthwise separable via conv_general_dilated with feature_group_count.
    b, h, w, c = img.shape
    x = jnp.moveaxis(img, -1, 1).reshape(b * c, 1, h, w)  # NCHW, C folded
    kcol = k.reshape(1, 1, -1, 1)
    krow = k.reshape(1, 1, 1, -1)
    dn = jax.lax.conv_dimension_numbers(x.shape, kcol.shape, ("NCHW", "OIHW", "NCHW"))
    x = jax.lax.conv_general_dilated(x, kcol, (1, 1), "VALID", dimension_numbers=dn)
    x = jax.lax.conv_general_dilated(x, krow, (1, 1), "VALID", dimension_numbers=dn)
    hh, ww = x.shape[2], x.shape[3]
    return jnp.moveaxis(x.reshape(b, c, hh, ww), 1, -1)


def ssim(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    data_range: float = 255.0,
    sigma: float = 1.5,
    k1: float = 0.01,
    k2: float = 0.03,
) -> jnp.ndarray:
    """Mean SSIM over (B, H, W, C) images (channels averaged, matching the
    reference's per-image scalar)."""
    kernel = _gaussian_kernel(sigma=sigma)
    x = pred.astype(jnp.float32)
    y = target.astype(jnp.float32)

    ux = _filter2d(x, kernel)
    uy = _filter2d(y, kernel)
    uxx = _filter2d(x * x, kernel)
    uyy = _filter2d(y * y, kernel)
    uxy = _filter2d(x * y, kernel)

    vx = uxx - ux * ux
    vy = uyy - uy * uy
    vxy = uxy - ux * uy

    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    num = (2 * ux * uy + c1) * (2 * vxy + c2)
    den = (ux * ux + uy * uy + c1) * (vx + vy + c2)
    return jnp.mean(num / den)


def per_frame_metrics(
    pred: jnp.ndarray, target: jnp.ndarray
) -> Dict[str, jnp.ndarray]:
    """Per-horizon metrics for (B, T, H, W, C) videos in [0, 1].

    Returns dict of (T,) arrays: mse, psnr, ssim — the reference's eval
    protocol (PSNR on [0,1] MSE; SSIM on ×255 frames)."""
    def one_frame(p, t):
        m = mse(p, t)
        return (
            m,
            10.0 * jnp.log10(1.0 / jnp.maximum(m, 1e-12)),
            ssim(p * 255.0, t * 255.0, data_range=255.0),
        )

    ms, ps, ss = jax.vmap(one_frame, in_axes=(1, 1))(pred, target)
    return {"mse": ms, "psnr": ps, "ssim": ss}
