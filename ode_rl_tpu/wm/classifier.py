"""Video classifier over world-model features (CATER task head).

Capability parity with /root/reference/dreamerv2/models.py:105-197
(ConvGRUClassifier): a recurrent readout (GRU) over RSSM posterior
features → multilabel logits, with the mAP and top-k accuracy metrics
from tools.mAP (/root/reference/dreamerv2/tools.py:355-383).
"""

from __future__ import annotations

from typing import Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ode_rl_tpu.nn.s3vae_nets import _GRU


class FeatureClassifier(nn.Module):
    n_classes: int
    hidden: int = 256
    multilabel: bool = True
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: jnp.ndarray) -> jnp.ndarray:
        """(B, T, F) posterior features → (B, n_classes) logits."""
        _, h_last = _GRU(self.hidden, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="gru")(feats)
        return nn.Dense(self.n_classes, dtype=self.dtype,
                        param_dtype=self.param_dtype, name="head")(h_last)

    def loss(self, feats: jnp.ndarray, labels: jnp.ndarray
             ) -> Tuple[jnp.ndarray, Dict]:
        logits = self(feats).astype(jnp.float32)
        labels = labels.astype(jnp.float32)
        if self.multilabel:
            lp = (labels * jax.nn.log_sigmoid(logits)
                  + (1 - labels) * jax.nn.log_sigmoid(-logits))
            loss = -jnp.mean(lp)
        else:
            loss = -jnp.mean(
                jnp.sum(labels * jax.nn.log_softmax(logits), -1))
        metrics = {"loss": loss,
                   "mAP": mean_average_precision(logits, labels),
                   "top5": top_k_accuracy(logits, labels, 5)}
        return loss, metrics


def reference_map_precision(logits: jnp.ndarray, labels: jnp.ndarray,
                            from_logits: bool = True) -> jnp.ndarray:
    """The metric the reference CALLS mAP (dreamerv2/tools.py:355-377):
    per-class precision at a fixed 0.5 threshold, TP/(TP+FP+1e-6),
    averaged over classes — not a ranked average precision. Shipped
    verbatim so numbers are comparable with the reference's published
    metric; ``mean_average_precision`` below is the proper ranked mAP."""
    p = jax.nn.sigmoid(logits) if from_logits else logits
    pred = p > 0.5
    y = labels.astype(jnp.float32)
    tp = jnp.sum((y == 1.0) & pred, axis=0).astype(jnp.float32)
    fp = jnp.sum((y == 0.0) & pred, axis=0).astype(jnp.float32)
    return jnp.mean(tp / (tp + fp + 1e-6))


def mean_average_precision(logits: jnp.ndarray, labels: jnp.ndarray
                           ) -> jnp.ndarray:
    """Multilabel mAP: mean over classes of ranked average precision,
    computed on-device. (Stricter than the reference's threshold metric
    — see reference_map_precision.)"""
    b, c = logits.shape

    def ap_for_class(scores, y):
        order = jnp.argsort(-scores)
        y_sorted = y[order]
        cum_tp = jnp.cumsum(y_sorted)
        precision = cum_tp / (jnp.arange(b) + 1.0)
        denom = jnp.maximum(jnp.sum(y_sorted), 1.0)
        return jnp.sum(precision * y_sorted) / denom

    aps = jax.vmap(ap_for_class, in_axes=(1, 1))(
        logits.astype(jnp.float32), labels.astype(jnp.float32))
    present = labels.sum(0) > 0
    return jnp.sum(jnp.where(present, aps, 0.0)) / jnp.maximum(
        jnp.sum(present), 1.0)


def top_k_accuracy(logits: jnp.ndarray, labels: jnp.ndarray, k: int = 5
                   ) -> jnp.ndarray:
    """Fraction of samples whose top-k predictions hit any true label."""
    k = min(k, logits.shape[-1])
    _, topk = jax.lax.top_k(logits, k)
    hit = jnp.take_along_axis(labels, topk, axis=-1).sum(-1) > 0
    return jnp.mean(hit.astype(jnp.float32))
