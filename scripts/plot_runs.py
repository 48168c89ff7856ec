#!/usr/bin/env python
"""Aggregate and plot training runs, optionally against baseline curves.

Capability parity with /root/reference/dreamerv2/plotting.py (541 LoC):
  * loads every ``metrics.jsonl`` under a logs root and converts each run
    into a (task, method, seed, xs, ys) record — the same record format
    the reference's score files use (dreamerv2/scores/*.json, e.g.
    ``{"task": "atari_alien", "method": "dreamerv2", "seed": "0",
    "xs": [...], "ys": [...]}``);
  * ``--baselines file.json ...`` overlays published baseline curves in
    that format (the reference vendors Atari/DMC score data, which is not
    shipped here — any file in the same schema plots identically);
  * bins the x axis (``--bins``), aggregates mean±std across seeds per
    (task, method), and renders one subplot per task, mirroring the
    reference's binning/aggregation pipeline (plotting.py load_runs /
    bin_scores / plot paths).

    python scripts/plot_runs.py --logs logs --metric loss --out runs.png
    python scripts/plot_runs.py --logs logs --metric psnr \
        --baselines scores/published.json --bins 20 --out cmp.png
"""

from __future__ import annotations

import argparse
import collections
import json
import pathlib
import re
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def load_run_records(root: pathlib.Path, metric: str):
    """metrics.jsonl runs → reference-format records.

    task = model dir (logs/<model>/<run>/metrics.jsonl), method = run id
    with a trailing seed / numeric suffix split off as the seed."""
    records = []
    for path in sorted(root.rglob("metrics.jsonl")):
        run = path.parent.name
        task = path.parent.parent.name if path.parent.parent != root else run
        rows = []
        for line in path.read_text().splitlines():
            try:
                rows.append(json.loads(line))
            except json.JSONDecodeError:
                continue
        xs = [r["step"] for r in rows if metric in r and "step" in r]
        ys = [r[metric] for r in rows if metric in r and "step" in r]
        if not xs:
            continue
        m = re.match(r"^(.*?)[_-]?(?:seed)?(\d+)$", run)
        method, seed = (m.group(1), m.group(2)) if m else (run, "0")
        records.append(dict(task=task, method=method or run, seed=seed,
                            xs=xs, ys=ys))
    return records


def load_baseline_records(paths, tasks=None):
    """Baseline score files in the reference's schema (a JSON list of
    {task, method, seed, xs, ys} records, dreamerv2/scores/*.json)."""
    records = []
    for p in paths:
        data = json.loads(pathlib.Path(p).read_text())
        assert isinstance(data, list), f"{p}: expected a list of records"
        for rec in data:
            if tasks and rec["task"] not in tasks:
                continue
            records.append(rec)
    return records


def bin_scores(xs, ys, borders):
    """Mean of ys whose xs fall in each bin (reference bin_scores:
    per-bin mean, NaN for empty bins, forward-filled)."""
    xs, ys = np.asarray(xs, np.float64), np.asarray(ys, np.float64)
    binned = np.full(len(borders) - 1, np.nan)
    for i, (lo, hi) in enumerate(zip(borders[:-1], borders[1:])):
        mask = (xs >= lo) & (xs < hi if i < len(borders) - 2 else xs <= hi)
        if mask.any():
            binned[i] = np.nanmean(ys[mask])
    # forward-fill gaps so std bands stay contiguous
    for i in range(1, len(binned)):
        if np.isnan(binned[i]):
            binned[i] = binned[i - 1]
    return binned


def aggregate(records, bins):
    """(task, method) → (centers, mean, std) across seeds."""
    by_key = collections.defaultdict(list)
    for rec in records:
        by_key[(rec["task"], rec["method"])].append(rec)
    out = {}
    for key, recs in by_key.items():
        lo = min(min(r["xs"]) for r in recs)
        hi = max(max(r["xs"]) for r in recs)
        if hi <= lo:
            hi = lo + 1
        borders = np.linspace(lo, hi, bins + 1)
        rows = np.stack([bin_scores(r["xs"], r["ys"], borders) for r in recs])
        centers = (borders[:-1] + borders[1:]) / 2
        out[key] = (centers, np.nanmean(rows, axis=0), np.nanstd(rows, axis=0))
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--logs", default="logs")
    ap.add_argument("--metric", default="loss")
    ap.add_argument("--baselines", nargs="*", default=[],
                    help="score files in the reference's record schema")
    ap.add_argument("--tasks", nargs="*", default=None,
                    help="restrict to these task names")
    ap.add_argument("--bins", type=int, default=30)
    ap.add_argument("--cols", type=int, default=3)
    ap.add_argument("--out", default="runs.png")
    args = ap.parse_args()

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    records = load_run_records(pathlib.Path(args.logs), args.metric)
    records += load_baseline_records(args.baselines, args.tasks)
    if args.tasks:
        records = [r for r in records if r["task"] in args.tasks]
    if not records:
        print(f"no runs under {args.logs} and no baseline records")
        return

    curves = aggregate(records, args.bins)
    tasks = sorted({t for t, _ in curves})
    cols = min(args.cols, len(tasks))
    rows = -(-len(tasks) // cols)
    fig, axes = plt.subplots(rows, cols, figsize=(5 * cols, 3.5 * rows),
                             squeeze=False)
    for ax in axes.flat[len(tasks):]:
        ax.axis("off")
    for ax, task in zip(axes.flat, tasks):
        for (t, method), (xs, mean, std) in sorted(curves.items()):
            if t != task:
                continue
            ax.plot(xs, mean, label=method, alpha=0.9)
            ax.fill_between(xs, mean - std, mean + std, alpha=0.2)
        ax.set_title(task, fontsize=10)
        ax.set_xlabel("step")
        ax.set_ylabel(args.metric)
        if args.metric in ("loss", "mse"):
            ax.set_yscale("log")
        ax.grid(alpha=0.3)
        ax.legend(fontsize=7)
    fig.tight_layout()
    fig.savefig(args.out, dpi=120)
    print(f"wrote {args.out} ({len(tasks)} tasks, "
          f"{len(curves)} (task, method) curves, {len(records)} records)")


if __name__ == "__main__":
    main()
