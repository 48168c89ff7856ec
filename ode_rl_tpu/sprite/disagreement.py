"""Disagreement-score metrics for DS-VAE disentanglement evaluation.

Capability parity with the reference's evaluation protocol
(/root/reference/code_sprite/test_DS_VAE_Sprite_Cls_disagree.py:
216-263): generate videos with one factor fixed and the other
resampled, classify both the originals (pred1) and the generations
(pred2) with a trained judge, then score

  * acc   — label agreement between pred1 and pred2 argmaxes,
  * kl    — KL(pred2 ‖ pred1) averaged over samples,
  * IS    — inception score of pred2 on a class-balanced subset,
  * H_yx  — conditional entropy of pred2 rows (balanced subset),
  * H_y   — entropy of pred2's marginal class distribution (balanced).

The balanced subset (equal samples per ground-truth class, reference
:221-224) removes label-distribution bias from the entropy family.
Numerics are pinned against the reference source in
tests/test_reference_parity.py.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

_EPS = 1e-16


def entropy_hy(p_yx: np.ndarray, eps: float = _EPS) -> float:
    """Entropy of the marginal class distribution (reference :233-236)."""
    p_y = p_yx.mean(axis=0)
    return float(-(p_y * np.log(p_y + eps)).sum())


def entropy_hyx(p_yx: np.ndarray, eps: float = _EPS) -> float:
    """Mean per-sample entropy (reference :238-242)."""
    return float(-np.mean((p_yx * np.log(p_yx + eps)).sum(axis=1)))


def inception_score(p_yx: np.ndarray, eps: float = _EPS) -> float:
    """exp(mean KL(p(y|x) ‖ p(y))) (reference :244-255)."""
    p_y = np.expand_dims(p_yx.mean(axis=0), 0)
    kl = (p_yx * (np.log(p_yx + eps) - np.log(p_y + eps))).sum(axis=1)
    return float(np.exp(np.mean(kl)))


def kl_divergence(p: np.ndarray, q: np.ndarray, eps: float = _EPS) -> float:
    """Mean per-sample KL(p ‖ q) over class rows (reference :257-263)."""
    kl = (p * (np.log(p + eps) - np.log(q + eps))).sum(axis=1)
    return float(np.mean(kl))


def balanced_subset_index(label_gt: np.ndarray) -> np.ndarray:
    """Indices keeping the same number of samples per ground-truth class
    (the reference's pre-IS/H selection, :221-224)."""
    n_per = min(int((label_gt == i).sum()) for i in np.unique(label_gt))
    return np.hstack([np.nonzero(label_gt == i)[0][:n_per]
                      for i in np.unique(label_gt)]).squeeze()


def disagreement_scores(pred1: np.ndarray, pred2: np.ndarray,
                        label_gt: np.ndarray) -> Dict[str, float]:
    """The full reference sweep (:216-231): pred1 = judge on the source
    videos' factor, pred2 = judge on generations with that factor fixed
    and the other factor resampled; rows are probability distributions."""
    label1 = np.argmax(pred1, axis=1)
    label2 = np.argmax(pred2, axis=1)
    idx = balanced_subset_index(np.asarray(label_gt))
    p2_sel = pred2[idx]
    return {
        "acc": float((label1 == label2).mean()),
        "kl": kl_divergence(pred2, pred1),
        "IS": inception_score(p2_sel),
        "H_yx": entropy_hyx(p2_sel),
        "H_y": entropy_hy(p2_sel),
    }
