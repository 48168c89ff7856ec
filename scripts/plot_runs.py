#!/usr/bin/env python
"""Aggregate and plot training runs, optionally against baseline curves.

Capability parity with /root/reference/dreamerv2/plotting.py (541 LoC):
  * loads every ``metrics.jsonl`` under one or more logs roots and
    converts each run into a (task, method, seed, xs, ys) record — the
    same record format the reference's score files use
    (dreamerv2/scores/*.json: ``{"task": ..., "method": ..., "seed": ...,
    "xs": [...], "ys": [...]}``);
  * ``--baselines file.json ...`` overlays baseline records; records with
    ``"xs": null`` plot as flat horizontal reference lines (the
    reference's scalar-baseline path, plotting.py baseline());
  * regex filters ``--tasks`` / ``--methods`` (reference find_keys /
    load_runs semantics: a run is kept if ANY pattern matches);
  * x-axis binning (``--bins``) with per-bin mean and forward fill
    (reference bin_scores);
  * ``--aggregate {mean,median,none}`` across seeds per (task, method):
    mean±std area, median with 20/80 percentile band, or one line per
    seed (reference curve_area / curve_lines);
  * ``--add {mean,median}`` appends a combined panel aggregating across
    ALL tasks after per-task lo/hi baseline normalization
    (``--lo/--hi`` method regexes, reference plot_combined);
  * axis controls ``--xlim/--ylim``, log-y for loss-like metrics.

    python scripts/plot_runs.py --logs logs --metric loss --out runs.png
    python scripts/plot_runs.py --logs logs --metric psnr \
        --baselines scores/published.json --bins 20 \
        --aggregate median --add mean --out cmp.png
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


def _matches(patterns, text) -> bool:
    return not patterns or any(re.search(p, text) for p in patterns)


def load_run_records(roots, metric, xaxis="step", tasks=None, methods=None):
    """metrics.jsonl runs → reference-format records.

    task = model dir (logs/<model>/<run>/metrics.jsonl), method = run id
    with a trailing seed / numeric suffix split off as the seed."""
    if isinstance(roots, (str, pathlib.Path)):
        roots = [roots]
    records = []
    for root in roots:
        root = pathlib.Path(root)
        for path in sorted(root.rglob("metrics.jsonl")):
            run = path.parent.name
            task = (path.parent.parent.name
                    if path.parent.parent != root else run)
            rows = []
            for line in path.read_text().splitlines():
                try:
                    rows.append(json.loads(line))
                except json.JSONDecodeError:
                    continue
            xs = [r[xaxis] for r in rows if metric in r and xaxis in r]
            ys = [r[metric] for r in rows if metric in r and xaxis in r]
            if not xs:
                continue
            m = re.match(r"^(.*?)[_-]?(?:seed)?(\d+)$", run)
            method, seed = (m.group(1), m.group(2)) if m else (run, "0")
            method = method or run
            if not (_matches(tasks, task) and _matches(methods, method)):
                continue
            records.append(dict(task=task, method=method, seed=seed,
                                xs=xs, ys=ys))
    return records


def load_baseline_records(paths, tasks=None, methods=None):
    """Baseline score files in the reference's schema (a JSON list of
    {task, method, seed, xs, ys} records, dreamerv2/scores/*.json).
    ``xs: null`` records are scalar baselines → flat lines."""
    records = []
    for p in paths:
        data = json.loads(pathlib.Path(p).read_text())
        assert isinstance(data, list), f"{p}: expected a list of records"
        for rec in data:
            if not (_matches(tasks, rec["task"])
                    and _matches(methods, rec["method"])):
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


def _bin_group(recs, bins):
    lo = min(min(r["xs"]) for r in recs)
    hi = max(max(r["xs"]) for r in recs)
    if hi <= lo:
        hi = lo + 1
    borders = np.linspace(lo, hi, bins + 1)
    rows = np.stack([bin_scores(r["xs"], r["ys"], borders) for r in recs])
    centers = (borders[:-1] + borders[1:]) / 2
    return centers, rows


def aggregate(records, bins, mode="mean"):
    """(task, method) → dict of curves. mode: mean → (mean, std band);
    median → (median, 20/80 percentile band); none → per-seed lines."""
    by_key = collections.defaultdict(list)
    for rec in records:
        by_key[(rec["task"], rec["method"])].append(rec)
    out = {}
    for key, recs in by_key.items():
        flat = [r for r in recs if r.get("xs") is None]
        recs = [r for r in recs if r.get("xs") is not None]
        entry = {}
        if flat:
            entry["flat"] = float(np.mean(
                [np.mean(np.atleast_1d(r["ys"])) for r in flat]))
        if recs:
            centers, rows = _bin_group(recs, bins)
            entry["xs"] = centers
            if mode == "none":
                entry["lines"] = [(r["seed"], row)
                                  for r, row in zip(recs, rows)]
            elif mode == "median":
                entry["mid"] = np.nanmedian(rows, axis=0)
                entry["lo"] = np.nanpercentile(rows, 20, axis=0)
                entry["hi"] = np.nanpercentile(rows, 80, axis=0)
            else:
                mean = np.nanmean(rows, axis=0)
                std = np.nanstd(rows, axis=0)
                entry["mid"], entry["lo"], entry["hi"] = (
                    mean, mean - std, mean + std)
        out[key] = entry
    return out


def combined_panel(records, bins, how, lo_pat=None, hi_pat=None):
    """Aggregate across ALL tasks per method (reference plot_combined):
    bin every run onto the longest run's grid, optionally normalize
    per-task by lo/hi baseline methods, then mean/median across tasks."""
    curve_recs = [r for r in records if r.get("xs") is not None]
    if not curve_recs:
        return {}
    tasks = sorted({r["task"] for r in curve_recs})
    borders = np.linspace(
        min(min(r["xs"]) for r in curve_recs),
        max(max(r["xs"]) for r in curve_recs), bins + 1)
    centers = (borders[:-1] + borders[1:]) / 2

    norms = {}
    if lo_pat and hi_pat:
        flats = collections.defaultdict(dict)
        for r in records:
            if r.get("xs") is None:
                val = float(np.mean(np.atleast_1d(r["ys"])))
                if re.search(lo_pat, r["method"]):
                    flats[r["task"]]["lo"] = val
                if re.search(hi_pat, r["method"]):
                    flats[r["task"]]["hi"] = val
        for task in tasks:
            f = flats.get(task, {})
            if "lo" in f and "hi" in f and f["hi"] != f["lo"]:
                norms[task] = (f["lo"], f["hi"])

    by_method = collections.defaultdict(list)
    for r in curve_recs:
        ys = bin_scores(r["xs"], r["ys"], borders)
        if r["task"] in norms:
            lo, hi = norms[r["task"]]
            ys = (ys - lo) / (hi - lo)
        elif norms:
            continue  # normalization requested but unavailable → drop
        by_method[r["method"]].append(ys)
    out = {}
    agg = np.nanmedian if how == "median" else np.nanmean
    for method, rows in by_method.items():
        rows = np.stack(rows)
        out[method] = {"xs": centers, "mid": agg(rows, axis=0),
                       "lo": np.nanpercentile(rows, 20, axis=0),
                       "hi": np.nanpercentile(rows, 80, axis=0)}
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--logs", nargs="*", default=["logs"])
    ap.add_argument("--metric", default="loss")
    ap.add_argument("--xaxis", default="step")
    ap.add_argument("--baselines", nargs="*", default=[],
                    help="score files in the reference's record schema")
    ap.add_argument("--tasks", nargs="*", default=None,
                    help="task name regexes (keep if any matches)")
    ap.add_argument("--methods", nargs="*", default=None,
                    help="method name regexes")
    ap.add_argument("--aggregate", choices=["mean", "median", "none"],
                    default="mean")
    ap.add_argument("--add", choices=["", "mean", "median"], default="",
                    help="append a combined panel across all tasks")
    ap.add_argument("--lo", default=None,
                    help="method regex: per-task 0-point for --add")
    ap.add_argument("--hi", default=None,
                    help="method regex: per-task 1-point for --add")
    ap.add_argument("--bins", type=int, default=30)
    ap.add_argument("--cols", type=int, default=3)
    ap.add_argument("--xlim", nargs=2, type=float, default=None)
    ap.add_argument("--ylim", nargs=2, type=float, default=None)
    ap.add_argument("--out", default="runs.png")
    args = ap.parse_args()

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    records = load_run_records(args.logs, args.metric, args.xaxis,
                               args.tasks, args.methods)
    records += load_baseline_records(args.baselines, args.tasks,
                                     args.methods)
    if not records:
        print(f"no runs under {args.logs} and no baseline records")
        return

    curves = aggregate(records, args.bins, args.aggregate)
    tasks = sorted({t for t, _ in curves})
    n_panels = len(tasks) + (1 if args.add else 0)
    cols = min(args.cols, n_panels)
    rows = -(-n_panels // cols)
    fig, axes = plt.subplots(rows, cols, figsize=(5 * cols, 3.5 * rows),
                             squeeze=False)
    for ax in axes.flat[n_panels:]:
        ax.axis("off")

    def draw(ax, entry, label):
        if "flat" in entry:
            ax.axhline(entry["flat"], ls="--", lw=1.2, alpha=0.8,
                       label=label)
        if "lines" in entry:
            for seed, row in entry["lines"]:
                ax.plot(entry["xs"], row, alpha=0.8,
                        label=f"{label}/s{seed}")
        elif "mid" in entry:
            ax.plot(entry["xs"], entry["mid"], label=label, alpha=0.9)
            ax.fill_between(entry["xs"], entry["lo"], entry["hi"],
                            alpha=0.2)

    for ax, task in zip(axes.flat, tasks):
        for (t, method), entry in sorted(curves.items()):
            if t == task:
                draw(ax, entry, method)
        ax.set_title(task, fontsize=10)
        ax.set_xlabel(args.xaxis)
        ax.set_ylabel(args.metric)
        if args.metric in ("loss", "mse") and not args.ylim:
            ax.set_yscale("log")
        if args.xlim:
            ax.set_xlim(args.xlim)
        if args.ylim:
            ax.set_ylim(args.ylim)
        ax.grid(alpha=0.3)
        ax.legend(fontsize=7)

    if args.add:
        ax = axes.flat[len(tasks)]
        for method, entry in sorted(
                combined_panel(records, args.bins, args.add,
                               args.lo, args.hi).items()):
            draw(ax, entry, method)
        norm = " (lo/hi-normalized)" if args.lo and args.hi else ""
        ax.set_title(f"{args.add} across tasks{norm}", fontsize=10)
        ax.set_xlabel(args.xaxis)
        ax.grid(alpha=0.3)
        ax.legend(fontsize=7)

    fig.tight_layout()
    fig.savefig(args.out, dpi=120)
    n_curves = len(curves)
    print(f"wrote {args.out} ({len(tasks)} tasks, {n_curves} "
          f"(task, method) curves, {len(records)} records)")


if __name__ == "__main__":
    main()
