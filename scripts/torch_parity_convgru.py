#!/usr/bin/env python
"""Second-family accuracy-parity twin: ConvGRU (VERDICT r4 #5).

Same matched-step protocol as scripts/torch_parity.py (the ODEConvGRU
study in PARITY.md), ported to the discrete-time ConvGRU family — the
cheap twin: no ODE solver, so the eager-CPU torch side is tractable.

Model = the reference's ConvGRU (depth=1 working path,
/root/reference/models/ConvGRU.py:10-51): conv downsample → ConvGRUCell
over observed frames → decoder ConvGRUCell free-runs n_out steps from
the final state (zero input, like the reference's input_tensor=None
path, modules/ConvGRUCell.py:66-84) → transposed-conv upsample →
sigmoid; MSE. Architecture dims match ode_rl_tpu/models/convgru.py
exactly (enc 1→16→64 stride-2, cell k=5 + GroupNorm(ch/32), dec
64→32→1 deconv).

    python scripts/torch_parity_convgru.py --data datasets/parity \
        --steps 2000 --out logs/parity/torch_convgru
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))
from torch_baseline import ConvGRUCell          # noqa: E402  (same cell)
from torch_parity import FrozenCorpus, _ssim_gray  # noqa: E402


class ConvGRUED(nn.Module):
    """Reference ConvGRU encoder–decoder (models/ConvGRU.py:10-51),
    dims matched to ode_rl_tpu.models.convgru.ConvGRUModel."""

    def __init__(self, ch=64):
        super().__init__()
        self.enc = nn.Sequential(
            nn.Conv2d(1, 16, 3, 2, 1), nn.LeakyReLU(0.2),
            nn.Conv2d(16, ch, 3, 2, 1), nn.LeakyReLU(0.2))
        self.enc_gru = ConvGRUCell(ch)
        self.dec_gru = ConvGRUCell(ch)
        self.dec = nn.Sequential(
            nn.ConvTranspose2d(ch, 32, 4, 2, 1), nn.LeakyReLU(0.2),
            nn.ConvTranspose2d(32, 1, 4, 2, 1))
        self.ch = ch

    def forward(self, frames, n_out):
        b, t, c, h, w = frames.shape
        e = self.enc(frames.reshape(b * t, c, h, w))
        e = e.reshape(b, t, self.ch, h // 4, w // 4)
        hid = torch.zeros_like(e[:, 0])
        for i in range(t):
            hid = self.enc_gru(hid, e[:, i])
        outs = []
        zero = torch.zeros_like(hid)
        for _ in range(n_out):
            hid = self.dec_gru(hid, zero)
            outs.append(hid)
        y = torch.stack(outs, dim=1).reshape(b * n_out, self.ch,
                                             h // 4, w // 4)
        y = torch.sigmoid(self.dec(y))
        return y.reshape(b, n_out, c, h, w)


def eval_per_horizon(model, corpus, n_videos, n_in, n_out, batch=4):
    """Reference test protocol (train_test.py:107-142)."""
    mses, ssims = [], []
    model.eval()
    with torch.no_grad():
        for b0 in range(0, n_videos, batch):
            vids = torch.stack([corpus.video(b0 + i, n_in + n_out)
                                for i in range(min(batch, n_videos - b0))])
            x, target = vids[:, :n_in], vids[:, n_in:]
            pred = model(x, n_out).clamp(0, 1)
            se = ((pred - target) ** 2).mean(dim=(0, 2, 3, 4))
            mses.append(se.numpy())
            ss = []
            for t in range(n_out):
                vals = [_ssim_gray(target[i, t, 0].numpy() * 255,
                                   pred[i, t, 0].numpy() * 255)
                        for i in range(pred.shape[0])]
                ss.append(np.mean(vals))
            ssims.append(np.asarray(ss))
    model.train()
    mse = np.mean(np.stack(mses), axis=0)
    psnr = 10.0 * np.log10(1.0 / np.maximum(mse, 1e-12))
    return {"mse": mse.tolist(), "psnr": psnr.tolist(),
            "ssim": np.mean(np.stack(ssims), axis=0).tolist()}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default="datasets/parity")
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--n_in", type=int, default=10)
    ap.add_argument("--n_out", type=int, default=10)
    ap.add_argument("--eval_out", type=int, default=190)
    ap.add_argument("--eval_videos", type=int, default=64)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="logs/parity/torch_convgru")
    args = ap.parse_args()

    torch.manual_seed(args.seed)
    torch.set_num_threads(1)
    out = pathlib.Path(args.out)
    out.mkdir(parents=True, exist_ok=True)

    train = FrozenCorpus(args.data, "train", args.batch,
                         args.n_in + args.n_out, seed=args.seed)
    test = FrozenCorpus(args.data, "test", args.batch,
                        args.n_in + args.eval_out, seed=args.seed)

    model = ConvGRUED()
    opt = torch.optim.Adam(model.parameters(), lr=args.lr)

    log = (out / "train_log.jsonl").open("a")
    t0 = time.time()
    for step in range(1, args.steps + 1):
        batch = train.next()
        x, target = batch[:, :args.n_in], batch[:, args.n_in:]
        opt.zero_grad()
        pred = model(x, args.n_out)
        loss = F.mse_loss(pred, target)
        loss.backward()
        opt.step()
        if step % 50 == 0 or step == 1:
            rec = {"step": step, "loss": float(loss),
                   "elapsed_s": round(time.time() - t0, 1)}
            log.write(json.dumps(rec) + "\n")
            log.flush()
            print(rec, flush=True)
    torch.save({"step": args.steps, "model": model.state_dict()},
               out / "ckpt.pt")

    results = {"steps": args.steps, "batch": args.batch, "lr": args.lr,
               "train_s": round(time.time() - t0, 1)}
    for n_out in (args.n_out, args.eval_out):
        key = f"{args.n_in}to{n_out}"
        print(f"evaluating {key}…", flush=True)
        results[key] = eval_per_horizon(
            model, test, args.eval_videos, args.n_in, n_out)
        print(key, "final-horizon mse", results[key]["mse"][-1], flush=True)
    (out / "metrics.json").write_text(json.dumps(results, indent=2))
    print("wrote", out / "metrics.json")


if __name__ == "__main__":
    main()
