#!/usr/bin/env python
"""Build the round-3 variant-coverage table from the variant run logs.

Companion to summarize_round3.py (which covers the model FAMILIES): this
one covers the selectable VARIANTS — the S3VAE encoder switch (reference
`modules/S3VAE_ED.py` encoder choices), the ODEConvGRU mem / z_sample
modes, and the cgrudecODE hybrid — each trained ~800 steps by
scripts/run_variants_round3.sh. Parses the `[step N] ... loss=X` stdout
lines into results/round3/variants_summary.json + VARIANTS.md.
"""

from __future__ import annotations

import json
import pathlib
import re

REPO = pathlib.Path(__file__).resolve().parent.parent
LOGDIR = REPO / "results" / "round3" / "logs"
OUT = REPO / "results" / "round3"

STEP_RE = re.compile(r"^\[step (\d+)\] (.*)$")

VARIANTS = [
    # (log stem, variant label, what it exercises)
    ("s3vae_cgru", "S3VAE encoder=cgru",
     "ConvGRU encoder (ref S3VAE_ED 'cgru')"),
    ("s3vae_cgru_sa", "S3VAE encoder=cgru_sa",
     "ConvGRU + SlotAttention encoder"),
    ("s3vae_odecgru", "S3VAE encoder=odecgru",
     "ODE-ConvGRU encoder inside S3VAE"),
    ("s3vae_cgru_rim", "S3VAE encoder=cgru_rim",
     "ConvRIM encoder (ref's broken skeleton, completed)"),
    ("s3vae_rim", "S3VAE encoder=rim",
     "RIM-block encoder"),
    ("s3vae_rim_sa", "S3VAE encoder=rim+sa",
     "RIM encoder + SlotAttention"),
    ("odecgru_mem", "ODEConvGRU mem=True",
     "stepwise re-anchored interval solves (lax.scan)"),
    ("odecgru_sample", "ODEConvGRU z_sample=True",
     "reparameterized z0 ('Not completed' in the reference)"),
    ("cgrudecODE", "cgrudecODE",
     "ConvGRU encoder + neural-ODE decode hybrid"),
]


def parse_log(path: pathlib.Path):
    """Return [(step, {metric: value})] from a variant stdout log."""
    rows = []
    if not path.exists():
        return rows
    for line in path.read_text(errors="replace").splitlines():
        m = STEP_RE.match(line.strip())
        if not m:
            continue
        step = int(m.group(1))
        metrics = {}
        for kv in m.group(2).split():
            if "=" not in kv:
                continue
            k, v = kv.split("=", 1)
            try:
                metrics[k] = float(v)
            except ValueError:
                continue
        rows.append((step, metrics))
    return rows


def main() -> None:
    summary = {}
    lines = [
        "# Round-3 variant-coverage runs",
        "",
        "Every selectable model variant trained ~800 steps on one v5e "
        "chip (complements ZOO.md, which covers each family once). "
        "Driver: `scripts/run_variants_round3.sh full`; raw stdout under "
        "`results/round3/logs/variant_*.log` (gitignored — this table and "
        "the JSON are the tracked record).",
        "",
        "| variant | exercises | steps | loss first → last | finite |",
        "|---|---|---|---|---|",
    ]
    for stem, label, what in VARIANTS:
        rows = parse_log(LOGDIR / f"variant_{stem}.log")
        rows = [(s, m) for s, m in rows if "loss" in m]
        if not rows:
            summary[label] = None
            lines.append(f"| {label} | {what} | — | (no log) | — |")
            continue
        first_s, first_m = rows[0]
        last_s, last_m = rows[-1]
        finite = all(v == v and abs(v) != float("inf")
                     for _, m in rows for v in m.values())
        entry = {
            "first_step": first_s, "first_loss": round(first_m["loss"], 4),
            "last_step": last_s, "last_loss": round(last_m["loss"], 4),
            "all_logged_metrics_finite": finite,
            "last_metrics": {k: round(v, 5) for k, v in last_m.items()},
        }
        summary[label] = entry
        lines.append(
            f"| {label} | {what} | {last_s} | "
            f"{entry['first_loss']} → {entry['last_loss']} | "
            f"{'yes' if finite else 'NO'} |")

    lines += [
        "",
        "z_sample note: the first 800-step pass (plain MSE, the "
        "reference's loss) diverged — |mu|,|std| grew ~1.5×/step into a "
        "degenerate all-black attractor, the decode solve truncated at "
        "the NFE budget, sigmoid saturation zeroed the gradient exactly, "
        "and Adam momentum coasted the latent head into NaN (probe "
        "transcript in the round-3 notes). The shipped config now "
        "completes the variant the latent-ODE way (`z_kl_weight: 0.01` "
        "ELBO term + nan_guard); the run above is with that fix — "
        "grad_norm stays alive (1e-3..1e-2), z0_kl anneals 1.24 → 0.02, "
        "nan_skipped = 0. Eval artifact: a 20→180 per-horizon sweep of "
        "the 800-step checkpoint is finite at all 180 horizons "
        "(`results/round3/artifacts/sample_odecgru_20to180_per_horizon"
        ".json`).",
    ]
    (OUT / "variants_summary.json").write_text(json.dumps(summary, indent=2))
    (OUT / "VARIANTS.md").write_text("\n".join(lines) + "\n")
    print("\n".join(lines))


if __name__ == "__main__":
    main()
