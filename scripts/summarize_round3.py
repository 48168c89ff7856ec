#!/usr/bin/env python
"""Build the round-3 zoo evidence table from run logs.

Collects, per model family: training steps, first/last logged loss, and
the eval artifact (per-horizon metrics / EPE / mAP / probe grids), into
results/round3/ZOO.md + zoo_summary.json.
"""

from __future__ import annotations

import json
import pathlib

REPO = pathlib.Path(__file__).resolve().parent.parent
LOGS = REPO / "logs"
OUT = REPO / "results" / "round3"


def _metrics_jsonl(run_dir: pathlib.Path):
    f = run_dir / "metrics.jsonl"
    if not f.exists():
        return []
    rows = []
    for line in f.read_text().splitlines():
        try:
            rows.append(json.loads(line))
        except json.JSONDecodeError:
            continue
    return rows


def _loss_span(rows):
    losses = [(r["step"], r["loss"]) for r in rows
              if "loss" in r and "step" in r]
    if not losses:
        return None
    losses.sort()
    return {"first_step": losses[0][0], "first_loss": round(losses[0][1], 4),
            "last_step": losses[-1][0], "last_loss": round(losses[-1][1], 4)}


def _final_metrics(rows, keys=("final_mse", "final_psnr", "final_ssim",
                               "final_lpips")):
    for r in reversed(rows):
        got = {k: round(r[k], 4) for k in keys if k in r}
        if got:
            return got
    return {}


def latest_run(model: str, needle: str = ""):
    base = LOGS / model
    if not base.exists():
        return None
    runs = [d for d in base.iterdir() if d.is_dir() and needle in d.name]
    if not runs:
        return None
    return max(runs, key=lambda d: d.stat().st_mtime)


FAMILIES = [
    # (family, train model dir, train-run needle, eval model dir, eval needle)
    ("S3VAE (4-term, flownet DFP labels)", "S3VAE", "train", "S3VAE", "test"),
    ("S2VAE", "S2VAE", "train", "S2VAE", "test"),
    ("CS2VAE", "CS2VAE", "train", "CS2VAE", "test"),
    ("DS2VAE", "DS2VAE", "train", "DS2VAE", "test"),
    ("VidODE + GAN", "VidODE", "gan", "VidODE", "gan"),
    ("VidODE (KTH-layout corpus, clip+nan-guard)", "VidODE", "kth",
     "VidODE", "kth"),
    ("VidODE (irregular sampling)", "VidODE", "irr", "VidODE", "irr"),
    ("Dreamer world model", "Dreamer", "train", "Dreamer", "train"),
    ("ConvLSTM", "ConvLSTM", "train", "ConvLSTM", "train"),
    ("DS-VAE (sprites)", "DSVAE", "train", "DSVAE", "test"),
    ("CATER classifier", "CATER", "", "CATER", ""),
]


def main() -> None:
    OUT.mkdir(parents=True, exist_ok=True)
    summary = {}
    lines = [
        "# Round-3 model-zoo convergence runs",
        "",
        "One short training run + one eval artifact per family, all on a "
        "single v5e chip (VERDICT round-2 directive #1). Full stdout in "
        "`results/round3/logs/`; run dirs under `logs/<Model>/`.",
        "",
        "| family | steps | loss first → last | eval artifact | final eval |",
        "|---|---|---|---|---|",
    ]
    for family, tmodel, tneedle, emodel, eneedle in FAMILIES:
        trun = latest_run(tmodel, tneedle)
        erun = latest_run(emodel, eneedle) if eneedle else trun
        row = {"train_dir": str(trun) if trun else None,
               "eval_dir": str(erun) if erun else None}
        span = _loss_span(_metrics_jsonl(trun)) if trun else None
        row["loss"] = span
        eval_rows = _metrics_jsonl(erun) if erun else []
        finals = _final_metrics(eval_rows)
        artifact = ""
        if erun and (erun / "per_horizon.json").exists():
            artifact = f"`{erun.relative_to(REPO)}/per_horizon.json`"
        if erun and (erun / "cater_eval.json").exists():
            finals = json.loads((erun / "cater_eval.json").read_text())
            artifact = f"`{erun.relative_to(REPO)}/cater_eval.json`"
        probe_dir = OUT / "dsvae_probes"
        if "sprites" in family and probe_dir.exists():
            artifact = f"`results/round3/dsvae_probes/` "\
                       f"({len(list(probe_dir.glob('*.png')))} probe grids)"
        row["final_eval"] = finals
        summary[family] = row

        span_s = (f"{span['first_loss']} → {span['last_loss']} "
                  f"(@{span['last_step']})" if span else "—")
        steps_s = str(span["last_step"]) if span else "—"
        finals_s = ", ".join(f"{k.replace('final_', '')}={v}"
                             for k, v in finals.items()
                             if isinstance(v, (int, float))) or "—"
        lines.append(f"| {family} | {steps_s} | {span_s} | "
                     f"{artifact or '—'} | {finals_s} |")

    # Flow nets (own report files).
    for name, f in (("FlowNetC", OUT / "flownetc.json"),
                    ("FlowNetS", OUT / "flownets.json")):
        if f.exists():
            rep = json.loads(f.read_text())
            summary[name] = rep
            if "val_epe_trained" in rep:
                lines.append(
                    f"| {name} | {rep['steps']} | loss "
                    f"{rep['final_train_loss']:.4f} | `{f.relative_to(REPO)}`"
                    f" | val EPE {rep['val_epe_trained']:.3f} vs "
                    f"{rep['val_epe_random_init']:.3f} random |")
            else:
                lines.append(
                    f"| {name} | {rep['steps']} | loss "
                    f"{rep['final_train_loss']:.4f}, EPE "
                    f"{rep['final_train_epe']:.3f} | `{f.relative_to(REPO)}`"
                    f" | train EPE {rep['final_train_epe']:.3f} |")

    (OUT / "zoo_summary.json").write_text(json.dumps(summary, indent=2))
    (OUT / "ZOO.md").write_text("\n".join(lines) + "\n")
    print("\n".join(lines))


if __name__ == "__main__":
    main()
