"""Visual diagnostics: image sheets, pred/GT dumps, metric-vs-horizon plots.

Capability parity with the reference's visual oracle layer:
  * Vid-ODE tester PNG dumps + image sheets
    (/root/reference/Vid-ODE/tester.py:49-77, visualize.py:11-110);
  * metric-vs-horizon plots + JSON dump
    (/root/reference/helpers/loggers.py:43-77 plot_metrics_vs_n_frames);
  * pred/GT video logging (train_test.py:61-66 wandb.Video equivalent —
    saved as PNG filmstrips, wandb-optional).
"""

from __future__ import annotations

import json
import pathlib
from typing import Dict, Optional, Sequence

import numpy as np


def _to_uint8(frames: np.ndarray) -> np.ndarray:
    """[0, 1] float frames → uint8, grayscale promoted to RGB."""
    x = np.clip(np.asarray(frames, np.float32), 0.0, 1.0)
    x = (x * 255.0).astype(np.uint8)
    if x.shape[-1] == 1:
        x = np.repeat(x, 3, axis=-1)
    return x


def save_filmstrip(path, videos: Sequence[np.ndarray],
                   labels: Optional[Sequence[str]] = None,
                   max_cols: int = 20) -> pathlib.Path:
    """Stack (T, H, W, C) videos as rows of a single PNG sheet
    (one column per frame) — the Vid-ODE image-sheet layout."""
    from PIL import Image

    rows = []
    for vid in videos:
        v = _to_uint8(vid)[:max_cols]
        rows.append(np.concatenate(list(v), axis=1))  # (H, T·W, 3)
    sheet = np.concatenate(rows, axis=0)
    path = pathlib.Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    Image.fromarray(sheet).save(path)
    return path


def dump_pred_gt_pngs(outdir, pred: np.ndarray, gt: np.ndarray) -> int:
    """Per-frame PNG dump (tester.py layout): pred_{b}_{t}.png /
    gt_{b}_{t}.png. Returns the number of files written."""
    from PIL import Image

    outdir = pathlib.Path(outdir)
    outdir.mkdir(parents=True, exist_ok=True)
    pred8, gt8 = _to_uint8(pred), _to_uint8(gt)
    n = 0
    for b in range(pred8.shape[0]):
        for t in range(pred8.shape[1]):
            Image.fromarray(pred8[b, t]).save(outdir / f"pred_{b}_{t}.png")
            Image.fromarray(gt8[b, t]).save(outdir / f"gt_{b}_{t}.png")
            n += 2
    return n


def plot_metrics_vs_horizon(path, per_horizon: Dict[str, Sequence[float]],
                            n_in: int = 0) -> pathlib.Path:
    """One subplot per metric over the prediction horizon + JSON dump
    (loggers.plot_metrics_vs_n_frames equivalence)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    path = pathlib.Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    metrics = [k for k in per_horizon if k in ("mse", "psnr", "ssim")]
    fig, axes = plt.subplots(1, len(metrics), figsize=(4 * len(metrics), 3))
    if len(metrics) == 1:
        axes = [axes]
    for ax, name in zip(axes, metrics):
        vals = per_horizon[name]
        xs = np.arange(len(vals)) + 1 + n_in
        ax.plot(xs, vals)
        ax.set_xlabel("frame")
        ax.set_title(name.upper())
        ax.grid(alpha=0.3)
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)
    path.with_suffix(".json").write_text(
        json.dumps({k: list(map(float, v))
                    for k, v in per_horizon.items()}))
    return path
