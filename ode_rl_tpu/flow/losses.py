"""Optical-flow training losses.

Capability parity with /root/reference/flownet2-pytorch/losses.py:
EPE (mean endpoint error), L1/L2, and MultiScale (weighted per-scale
loss over the pyramid of flow predictions, losses.py:52-72; default
scale weights 0.005·(0.32, 0.08, 0.02, 0.01, 0.005) coarse→fine ordering
as in the startScale=4 configuration).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def epe(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Mean endpoint error over (B, H, W, 2) flows."""
    return jnp.mean(jnp.linalg.norm(pred - target, axis=-1))


def l1_loss(pred, target):
    return jnp.mean(jnp.abs(pred - target))


def l2_loss(pred, target):
    return jnp.mean(jnp.linalg.norm(pred - target, axis=-1))


def multiscale_loss(
    flow_pyramid: Sequence[jnp.ndarray],
    target: jnp.ndarray,
    weights: Sequence[float] = (0.32, 0.08, 0.02, 0.01, 0.005),
    start_scale: int = 4,
    norm: str = "l1",
) -> jnp.ndarray:
    """Weighted sum of per-scale losses; the target is average-pooled to
    each prediction's resolution (finest prediction first)."""
    loss_fn = l1_loss if norm == "l1" else l2_loss
    total = 0.0
    for i, flow in enumerate(flow_pyramid):
        scale = start_scale * (2 ** i)
        b, h, w, c = target.shape
        tgt = jax.image.resize(
            target, (b, h // scale, w // scale, c), "bilinear") / scale
        total = total + weights[i] * loss_fn(flow, tgt)
    return total
