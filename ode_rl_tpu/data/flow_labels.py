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

import jax.numpy as jnp


def motion_grid_labels(
    video: jnp.ndarray, grid: int = 3, topk: int = 3
) -> jnp.ndarray:
    """(B, T, H, W, C) video in [0, 1] → (B, T-1, grid*grid) multi-hot."""
    b, t, h, w, c = video.shape
    diff = jnp.abs(video[:, 1:] - video[:, :-1])  # (B, T-1, H, W, C)
    gh, gw = h // grid, w // grid
    cells = diff[:, :, : gh * grid, : gw * grid].reshape(
        b, t - 1, grid, gh, grid, gw, c
    )
    mag = cells.mean(axis=(3, 5, 6)).reshape(b, t - 1, grid * grid)
    # Multi-hot of the top-k cells per transition.
    kth = jnp.sort(mag, axis=-1)[..., -topk][..., None]
    labels = (mag >= kth).astype(video.dtype)
    return labels
