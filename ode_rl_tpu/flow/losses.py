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
    """Weighted sum of per-scale losses, finest prediction first.

    DEVIATION from the reference's MultiScale: targets are bilinear-
    resized AND divided by the scale factor, so each level is supervised
    in its own resolution's pixel units (this is the convention the
    shipped FlowNetC weights and validate_epe's stride-4 × 4.0 recovery
    assume). The reference instead avg-pools the target and scales it
    once globally by div_flow=0.05 (losses.py:52-80) — that exact form
    is ``multiscale_loss_reference`` below."""
    loss_fn = l1_loss if norm == "l1" else l2_loss
    total = 0.0
    for i, flow in enumerate(flow_pyramid):
        scale = start_scale * (2 ** i)
        b, h, w, c = target.shape
        tgt = jax.image.resize(
            target, (b, h // scale, w // scale, c), "bilinear") / scale
        total = total + weights[i] * loss_fn(flow, tgt)
    return total


def _avg_pool(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """AvgPool2d(kernel=stride=k) on NHWC."""
    b, h, w, c = x.shape
    return jnp.mean(x.reshape(b, h // k, k, w // k, k, c), axis=(2, 4))


def multiscale_loss_reference(
    flow_pyramid: Sequence[jnp.ndarray],
    target: jnp.ndarray,
    weights: Sequence[float] = (0.32, 0.16, 0.08, 0.04, 0.02),
    start_scale: int = 4,
    norm: str = "l1",
    div_flow: float = 0.05,
):
    """The reference's MultiScale loss exactly
    (flownet2-pytorch/losses.py:52-80): target scaled once by div_flow,
    avg-pooled (kernel=stride=startScale·2^i) to each level, per-level
    weights l_weight/2^i, and the summed weighted EPE reported alongside.
    Returns (loss, epe) like the reference's [lossvalue, epevalue]."""
    loss_fn = l1_loss if norm == "l1" else l2_loss
    target = div_flow * target
    total, epe_total = 0.0, 0.0
    for i, flow in enumerate(flow_pyramid):
        tgt = _avg_pool(target, start_scale * (2 ** i))
        total = total + weights[i] * loss_fn(flow, tgt)
        epe_total = epe_total + weights[i] * epe(flow, tgt)
    return total, epe_total
