"""Motion-grid supervision labels, computed on device.

Capability parity with the reference's flow-label pipeline
(reference helpers/flow_utils.py:8-92 + scripts/get_labels_from_pred_flow.py):
the reference runs FlowNet2 offline, converts flow to an HSV image, splits
it into a 3×3 grid, and marks the top-k cells by mean motion magnitude as a
multi-hot label per transition — consumed by the S3VAE DFP loss.

TPU-first replacement: motion magnitude is measured directly from frame
differences on device (no offline FlowNet pass, no .npy side-channel), so
labels are generated in the same jitted program as the batch. The label
format is identical: (B, T-1, grid*grid) multi-hot with k ones.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _grid_topk(mag: jnp.ndarray, grid: int, topk: int) -> jnp.ndarray:
    """(B, T, H, W, 1) magnitude map → (B, T, grid²) top-k multi-hot."""
    b, t, h, w, _ = mag.shape
    gh, gw = h // grid, w // grid
    cells = mag[:, :, : gh * grid, : gw * grid].reshape(
        b, t, grid, gh, grid, gw, 1)
    m = cells.mean(axis=(3, 5, 6)).reshape(b, t, grid * grid)
    kth = jnp.sort(m, axis=-1)[..., -topk][..., None]
    return (m >= kth).astype(mag.dtype)


def motion_grid_labels(
    video: jnp.ndarray, grid: int = 3, topk: int = 3
) -> jnp.ndarray:
    """(B, T, H, W, C) video in [0, 1] → (B, T-1, grid*grid) multi-hot,
    motion measured as frame-difference magnitude (cheap proxy)."""
    diff = jnp.abs(video[:, 1:] - video[:, :-1]).mean(
        axis=-1, keepdims=True)                       # (B, T-1, H, W, 1)
    return _grid_topk(diff, grid, topk)


def flow_grid_labels(
    flow: jnp.ndarray, grid: int = 3, topk: int = 3
) -> jnp.ndarray:
    """(B, T-1, H, W, 2) predicted flow → (B, T-1, grid*grid) multi-hot by
    per-cell mean flow magnitude. The reference measures the mean HSV
    *saturation* of rendered flow videos (helpers/flow_utils.py:71-92 via
    scripts/get_labels_from_pred_flow.py:30-49) — in standard flow
    visualization saturation encodes exactly the flow magnitude, so this
    computes the same statistic without the mp4/HSV round-trip."""
    mag = jnp.linalg.norm(flow, axis=-1, keepdims=True)
    return _grid_topk(mag, grid, topk)


def make_flownet_label_fn(flownet, params, grid: int = 3, topk: int = 3):
    """Returns ``video → labels`` running FlowNetC between consecutive
    frames INSIDE the jitted train step (the TPU-native form of the
    reference's offline FlowNet→mp4→HSV→npy pipeline): predicted flow at
    the finest pyramid level, upsampled ×4, then flow_grid_labels."""

    def label_fn(video: jnp.ndarray) -> jnp.ndarray:
        b, t, h, w, c = video.shape
        img = video if c == 3 else jnp.repeat(video, 3, axis=-1)[..., :3]
        i1 = img[:, :-1].reshape(b * (t - 1), h, w, 3)
        i2 = img[:, 1:].reshape(b * (t - 1), h, w, 3)
        flows = flownet.apply(params, i1, i2)
        full = jax.image.resize(
            flows[0], (b * (t - 1), h, w, 2), "bilinear") * 4.0
        return flow_grid_labels(full.reshape(b, t - 1, h, w, 2),
                                grid, topk)

    return label_fn
