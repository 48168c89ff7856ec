#!/usr/bin/env python
"""Evaluate a torch_parity checkpoint (ckpt.pt) with the reference
per-horizon protocol, without waiting for the full training run —
lets the matched-step parity table (BASELINE.md) compare ours vs torch
at whatever step both runs have reached.

    python scripts/torch_parity_eval.py --ckpt logs/parity/torch/ckpt.pt \
        --data datasets/parity --out logs/parity/torch
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys

import torch

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))
from torch_baseline import ODEConvGRU  # noqa: E402
from torch_parity import FrozenCorpus, eval_per_horizon  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="logs/parity/torch/ckpt.pt")
    ap.add_argument("--data", default="datasets/parity")
    ap.add_argument("--n_in", type=int, default=10)
    ap.add_argument("--eval_outs", default="10,90")
    ap.add_argument("--eval_videos", type=int, default=64)
    ap.add_argument("--out", default="logs/parity/torch")
    args = ap.parse_args()

    torch.set_num_threads(1)
    snap = torch.load(args.ckpt, map_location="cpu", weights_only=False)
    model = ODEConvGRU()
    model.load_state_dict(snap["model"])
    step = snap["step"]
    print(f"loaded {args.ckpt} step {step}")

    outs = [int(x) for x in args.eval_outs.split(",")]
    test = FrozenCorpus(args.data, "test", 4, args.n_in + max(outs))
    results = {"step": step}
    for n_out in outs:
        key = f"{args.n_in}to{n_out}"
        print(f"evaluating {key}…", flush=True)
        results[key] = eval_per_horizon(
            model, test, args.eval_videos, args.n_in, n_out)
        print(key, "final-horizon mse", results[key]["mse"][-1], flush=True)
    out = pathlib.Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    path = out / f"metrics_step{step}.json"
    path.write_text(json.dumps(results, indent=2))
    print("wrote", path)


if __name__ == "__main__":
    main()
