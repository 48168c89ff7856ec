#!/usr/bin/env python
"""Round-4 Dreamer sweep selector / summarizer.

Reads the 10->10 open-loop eval artifacts written by
scripts/run_dreamer_round4.sh, ranks recipes by mean SSIM, and emits:
  --phase summarize : write results/round4/dreamer/sweep_summary.json
  --phase best      : print the winning "<config block> [flags]" line the
                      driver script passes to the 25k phase-B run
  --phase final     : collect phase-B evals + decomposed loss tail into
                      results/round4/dreamer/deep25k_summary.json
"""

from __future__ import annotations

import argparse
import json
import pathlib

ROOT = pathlib.Path(__file__).resolve().parent.parent
OUT = ROOT / "results/round4/dreamer"

RECIPES = {
    "gauss_ref": "train_mmnist_dreamer",
    "discrete": "train_mmnist_dreamer_discrete",
    "gauss_free0": "train_mmnist_dreamer --kl_free 0.0",
    "gauss_kl01": "train_mmnist_dreamer --kl_scale 0.1",
}


def _mean(xs):
    xs = list(xs)
    return sum(xs) / max(len(xs), 1)


def _run_dir(run_id: str):
    """Resolve the run dir; resolve_run_id suffixes ids with _<in>_<out>."""
    base = ROOT / "logs/Dreamer"
    if (base / run_id).exists():
        return base / run_id
    hits = sorted(base.glob(f"{run_id}_*"))
    return hits[0] if hits else base / run_id


def eval_metrics(run_id: str):
    path = _run_dir(run_id) / "per_horizon.json"
    if not path.exists():
        return None
    ph = json.loads(path.read_text())
    return {k: _mean(v) for k, v in ph.items() if isinstance(ph[k], list)}


def loss_tail(run_id: str, n: int = 5):
    """Last-n decomposed metric rows from the run's metrics.jsonl."""
    path = _run_dir(run_id) / "metrics.jsonl"
    if not path.exists():
        return []
    rows = [json.loads(l) for l in path.read_text().splitlines() if l.strip()]
    rows = [r for r in rows if "image_loss" in r or "kl_loss" in r]
    return rows[-n:]


def summarize():
    table = {}
    for tag in RECIPES:
        table[tag] = {
            "recipe": RECIPES[tag],
            "eval_10_10": eval_metrics(f"Dreamer_r4_{tag}_eval1010"),
            "loss_tail": loss_tail(f"Dreamer_r4_{tag}"),
        }
    OUT.mkdir(parents=True, exist_ok=True)
    (OUT / "sweep_summary.json").write_text(json.dumps(table, indent=2) + "\n")
    for tag, row in table.items():
        ev = row["eval_10_10"]
        ssim = ev.get("ssim") if ev else None
        print(f"{tag:14s} ssim={ssim}")
    return table


def best():
    scored = []
    for tag in RECIPES:
        ev = eval_metrics(f"Dreamer_r4_{tag}_eval1010")
        if ev and "ssim" in ev:
            scored.append((ev["ssim"], tag))
    if not scored:
        # Fall back to the reference-exact recipe if no eval landed.
        print(RECIPES["gauss_ref"])
        return
    scored.sort(reverse=True)
    tag = scored[0][1]
    (OUT / "phaseB_choice.json").write_text(json.dumps(
        {"tag": tag, "recipe": RECIPES[tag],
         "sweep_ssim": scored[0][0]}) + "\n")
    print(RECIPES[tag])


def final():
    report = {
        "deep25k_eval_10_10": eval_metrics("Dreamer_r4_deep25k_eval1010"),
        "deep25k_eval_20_180": eval_metrics("Dreamer_r4_deep25k_eval20180"),
        "deep25k_loss_tail": loss_tail("Dreamer_r4_deep25k", n=8),
    }
    choice = OUT / "phaseB_choice.json"
    if choice.exists():
        report["recipe"] = json.loads(choice.read_text())
    OUT.mkdir(parents=True, exist_ok=True)
    (OUT / "deep25k_summary.json").write_text(
        json.dumps(report, indent=2) + "\n")
    print(json.dumps({k: v for k, v in report.items()
                      if k != "deep25k_loss_tail"}, indent=2))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--phase", choices=["summarize", "best", "final"],
                    required=True)
    args = ap.parse_args()
    {"summarize": summarize, "best": best, "final": final}[args.phase]()
