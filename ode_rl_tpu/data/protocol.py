"""Batch-dict protocol.

Mirrors the reference's batch contract (reference helpers/utils.py:89-145):
normalized timestamps ``arange(0, T) / T`` split into ``observed_tp`` /
``tp_to_predict``, observed/predict frame splits, masks, and flow-motion
grid labels. Everything is a device array; the dict flows straight into the
jitted train step.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp

from ode_rl_tpu.data.flow_labels import motion_grid_labels


def timestamps_for(n_in: int, n_out: int, dtype=jnp.float32):
    """(observed_tp, tp_to_predict): arange(0, T)/T split at n_in."""
    total = n_in + n_out
    ts = jnp.arange(0, total, dtype=dtype) / total
    return ts[:n_in], ts[n_in:]


def make_batch_dict(
    video: jnp.ndarray,
    n_in: int,
    with_flow_labels: bool = False,
    flow_grid: int = 3,
    flow_topk: int = 3,
    mask: Optional[jnp.ndarray] = None,
    flow_label_fn=None,
) -> Dict[str, jnp.ndarray]:
    """Split a (B, T, H, W, C) video in [-0.5, 0.5] into the batch dict.

    ``flow_label_fn`` overrides the frame-diff label proxy with a custom
    ``[0,1]-video → (B, T-1, grid²)`` function — e.g. the FlowNetC
    predicted-flow pipeline (data/flow_labels.make_flownet_label_fn,
    matching reference scripts/get_labels_from_pred_flow.py)."""
    b, t = video.shape[:2]
    n_out = t - n_in
    observed_tp, tp_to_predict = timestamps_for(n_in, n_out)
    batch = {
        "observed_data": video[:, :n_in],
        "data_to_predict": video[:, n_in:],
        "observed_tp": observed_tp,
        "tp_to_predict": tp_to_predict,
        "observed_mask": jnp.ones((b, n_in), video.dtype) if mask is None else mask[:, :n_in],
        "mask_predicted_data": jnp.ones((b, n_out), video.dtype) if mask is None else mask[:, n_in:],
    }
    if with_flow_labels:
        # Reference: per-frame flow-motion grid labels for the first
        # n_in - 1 transitions (dataloader.py:167-172).
        if flow_label_fn is not None:
            labels = flow_label_fn(video + 0.5)
        else:
            labels = motion_grid_labels(video + 0.5, grid=flow_grid,
                                        topk=flow_topk)
        batch["in_flow_labels"] = labels[:, : n_in - 1]
        batch["out_flow_labels"] = labels[:, : n_in - 1]  # ref reuses in-labels
    return batch
