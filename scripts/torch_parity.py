#!/usr/bin/env python
"""Accuracy-parity reference run: train the reference-equivalent PyTorch
ODEConvGRU (scripts/torch_baseline.py model — eager, torchdiffeq-style
dopri5 with backprop through the solver) on the SAME frozen Moving MNIST
corpus the JAX framework trains on, with the reference recipe's
hyperparameters (Adam lr 1e-4, batch 4, 10→10 MSE;
/root/reference/configs.yaml:593-607), then evaluate per-horizon
MSE/PSNR/SSIM on the held-out 10→90 protocol
(/root/reference/train_test.py:107-143, test_mmnist_odecgru_len20_1ch).

The full 50k-step recipe is infeasible on this host's single CPU core
(~2 s/step eager); run a matched-step comparison instead: train BOTH
frameworks for --steps steps on identical data and compare converged
metrics (VERDICT.md next-round item 2 allows exactly this).

    python scripts/torch_parity.py --data datasets/parity --steps 2000 \
        --out logs/parity/torch
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

import numpy as np
import torch
import torch.nn.functional as F

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))
from torch_baseline import ODEConvGRU  # noqa: E402  (same twin model)


class FrozenCorpus:
    """Same sampling semantics as ode_rl_tpu.data.frozen.FrozenMovingMNIST:
    random shard → random video → random window; frames → float [0, 1]."""

    def __init__(self, root, split, batch, n_total, seed=0):
        self.shards = sorted(
            (pathlib.Path(root) / split).glob("shard_*.npy"))
        assert self.shards, f"no shards under {root}/{split}"
        self.batch = batch
        self.n_total = n_total
        self.rng = np.random.RandomState(seed)
        self._cache = {}

    def shard(self, p):
        if p not in self._cache:
            self._cache[p] = np.load(p, mmap_mode="r")
        return self._cache[p]

    def next(self):
        shard = self.shard(self.shards[self.rng.randint(len(self.shards))])
        n_videos, n_frames = shard.shape[:2]
        vids = self.rng.randint(0, n_videos, self.batch)
        starts = self.rng.randint(0, n_frames - self.n_total + 1, self.batch)
        batch = np.stack([shard[v, s:s + self.n_total]
                          for v, s in zip(vids, starts)])
        return torch.from_numpy(batch.astype(np.float32) / 255.0)[:, :, None]

    def video(self, idx, n_total):
        """Deterministic full video (for eval), float [0, 1], (T,1,H,W)."""
        per = self.shard(self.shards[0]).shape[0]
        shard = self.shard(self.shards[idx // per])
        v = shard[idx % per, :n_total]
        return torch.from_numpy(v.astype(np.float32) / 255.0)[:, None]


def _ssim_gray(x, y, data_range=255.0, sigma=1.5, k1=0.01, k2=0.03):
    """Gaussian-weighted SSIM for one grayscale image pair — the skimage
    settings the reference evaluates with (gaussian_weights=True,
    use_sample_covariance=False → 11×11 window σ=1.5; skimage itself is
    not installed in this image). Matches ode_rl_tpu.train.metrics.ssim."""
    radius = int(3.5 * sigma + 0.5)
    g = np.exp(-0.5 * (np.arange(-radius, radius + 1) / sigma) ** 2)
    g = (g / g.sum()).astype(np.float64)

    def filt(img):
        from numpy.lib.stride_tricks import sliding_window_view
        tmp = sliding_window_view(img, len(g), axis=0) @ g
        return sliding_window_view(tmp, len(g), axis=1) @ g

    x = x.astype(np.float64)
    y = y.astype(np.float64)
    ux, uy = filt(x), filt(y)
    vx = filt(x * x) - ux * ux
    vy = filt(y * y) - uy * uy
    vxy = filt(x * y) - ux * uy
    c1, c2 = (k1 * data_range) ** 2, (k2 * data_range) ** 2
    num = (2 * ux * uy + c1) * (2 * vxy + c2)
    den = (ux * ux + uy * uy + c1) * (vx + vy + c2)
    return float(np.mean(num / den))


def eval_per_horizon(model, corpus, n_videos, n_in, n_out, batch=4):
    """Reference test protocol: per-prediction-horizon MSE, PSNR, SSIM
    on ×255 frames (reference train_test.py:107-142,
    helpers/utils.py:254-271)."""

    ts_all = torch.arange(0, n_in + n_out, dtype=torch.float32) / (n_in + n_out)
    mses, ssims = [], []
    model.eval()
    with torch.no_grad():
        for b0 in range(0, n_videos, batch):
            vids = torch.stack([corpus.video(b0 + i, n_in + n_out)
                                for i in range(min(batch, n_videos - b0))])
            x, target = vids[:, :n_in], vids[:, n_in:]
            pred, _ = model(x, ts_all[:n_in], ts_all[n_in:])
            pred = pred.clamp(0, 1)
            se = ((pred - target) ** 2).mean(dim=(0, 2, 3, 4))  # (T,)
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
    ap.add_argument("--eval_out", type=int, default=90)
    ap.add_argument("--eval_videos", type=int, default=64)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="logs/parity/torch")
    ap.add_argument("--ckpt_every", type=int, default=500)
    args = ap.parse_args()

    torch.manual_seed(args.seed)
    torch.set_num_threads(1)
    out = pathlib.Path(args.out)
    out.mkdir(parents=True, exist_ok=True)

    train = FrozenCorpus(args.data, "train", args.batch,
                         args.n_in + args.n_out, seed=args.seed)
    test = FrozenCorpus(args.data, "test", args.batch,
                        args.n_in + args.eval_out, seed=args.seed)

    model = ODEConvGRU()
    opt = torch.optim.Adam(model.parameters(), lr=args.lr)
    n_tot = args.n_in + args.n_out
    ts_all = torch.arange(0, n_tot, dtype=torch.float32) / n_tot
    ts_obs, ts_pred = ts_all[:args.n_in], ts_all[args.n_in:]

    log = (out / "train_log.jsonl").open("a")
    t0 = time.time()
    for step in range(1, args.steps + 1):
        batch = train.next()
        x, target = batch[:, :args.n_in], batch[:, args.n_in:]
        opt.zero_grad()
        pred, nfe_steps = model(x, ts_obs, ts_pred)
        loss = F.mse_loss(pred, target)
        loss.backward()
        opt.step()
        if step % 50 == 0 or step == 1:
            rec = {"step": step, "loss": float(loss),
                   "solver_steps": nfe_steps,
                   "elapsed_s": round(time.time() - t0, 1)}
            log.write(json.dumps(rec) + "\n")
            log.flush()
            print(rec, flush=True)
        if step % args.ckpt_every == 0 or step == args.steps:
            torch.save({"step": step, "model": model.state_dict(),
                        "opt": opt.state_dict()}, out / "ckpt.pt")

    # Reference eval protocol: 10→10 and 10→90 per-horizon.
    results = {"steps": args.steps, "batch": args.batch, "lr": args.lr,
               "train_s": round(time.time() - t0, 1)}
    for n_out in (args.n_out, args.eval_out):
        key = f"{args.n_in}to{n_out}"
        print(f"evaluating {key}…", flush=True)
        results[key] = eval_per_horizon(
            model, test, args.eval_videos, args.n_in, n_out)
        print(key, "final-horizon mse",
              results[key]["mse"][-1], flush=True)
    (out / "metrics.json").write_text(json.dumps(results, indent=2))
    print("wrote", out / "metrics.json")


if __name__ == "__main__":
    main()
