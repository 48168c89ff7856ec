#!/usr/bin/env python
"""Produce the cross-round zoo aggregation figure via plot_runs.py.

Demonstrates the full plotting.py-parity surface of scripts/plot_runs.py
(multi-run aggregation, x-binning, baseline overlay on the same axes —
reference /root/reference/dreamerv2/plotting.py) on REAL runs:

  * round-3 zoo training curves (results/round3/curves/*.jsonl), staged
    into the ``<task>/<run>/metrics.jsonl`` layout plot_runs loads;
  * round-4 runs already in that layout under logs/;
  * the measured torch eager reference twin (ODE-ConvGRU recipe on this
    image's CPU, results/round2/parity_torch_train_log.jsonl) converted
    to the reference's score-record schema and overlaid as a baseline on
    the ConvGRU-family panel.

Output: results/round4/zoo_aggregate.png
"""

from __future__ import annotations

import json
import pathlib
import shutil
import subprocess
import sys
import tempfile

ROOT = pathlib.Path(__file__).resolve().parents[1]


def stage_round3_curves(stage: pathlib.Path) -> None:
    """results/round3/curves/<name>_train_metrics.jsonl →
    <Task>/<name>_r3_0/metrics.jsonl (trailing 0 parses as the seed)."""
    task_of = {
        "cater": "Dreamer", "dreamer": "Dreamer",
        "spatial_dreamer": "Dreamer",
        "convlstm": "ConvLSTM",
        "cs2vae": "S3VAE", "ds2vae": "S3VAE", "dsvae": "S3VAE",
        "s2vae": "S3VAE", "s3vae": "S3VAE",
        "vidode": "VidODE", "vidode_irregular": "VidODE",
        "vidode_kth": "VidODE",
    }
    for path in sorted((ROOT / "results/round3/curves").glob("*.jsonl")):
        name = path.stem.replace("_train_metrics", "")
        task = task_of.get(name, name)
        run = stage / task / f"{name}_r3_0"
        run.mkdir(parents=True, exist_ok=True)
        shutil.copy(path, run / "metrics.jsonl")


def torch_baseline_record(out_json: pathlib.Path) -> None:
    """Torch eager twin train log → reference score-record schema."""
    xs, ys = [], []
    log = ROOT / "results/round2/parity_torch_train_log.jsonl"
    for line in log.read_text().splitlines():
        rec = json.loads(line)
        xs.append(rec["step"])
        ys.append(rec["loss"])
    out_json.write_text(json.dumps([{
        "task": "ConvGRU",
        "method": "torch-eager-cpu (reference ODE-ConvGRU twin)",
        "seed": 0, "xs": xs, "ys": ys,
    }]) + "\n")


def main() -> None:
    tmp = pathlib.Path(tempfile.mkdtemp(prefix="zoo_stage_"))
    stage_round3_curves(tmp)
    baselines = tmp / "torch_baseline.json"
    torch_baseline_record(baselines)
    out = ROOT / "results/round4/zoo_aggregate.png"
    cmd = [sys.executable, str(ROOT / "scripts/plot_runs.py"),
           "--logs", str(tmp), str(ROOT / "logs"),
           "--metric", "loss", "--bins", "30", "--aggregate", "mean",
           "--baselines", str(baselines),
           "--cols", "3", "--out", str(out)]
    subprocess.run(cmd, check=True)
    print(f"figure → {out}")


if __name__ == "__main__":
    main()
