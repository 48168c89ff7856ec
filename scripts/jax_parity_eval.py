#!/usr/bin/env python
"""Evaluate a trained ode_rl_tpu ODEConvGRU checkpoint on the EXACT same
held-out videos scripts/torch_parity.py evaluates its torch twin on
(deterministic: test-corpus videos 0..N-1, frames 0..n_in+n_out), with the
reference's per-horizon MSE/PSNR/SSIM protocol
(/root/reference/train_test.py:107-143). Writes metrics.json next to the
torch run's for the parity table in BASELINE.md.

    python scripts/jax_parity_eval.py --data datasets/parity \
        --ckpt_id parity_odecgru_jax --out logs/parity/jax
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default="datasets/parity")
    ap.add_argument("--ckpt_id", default="parity_odecgru_jax")
    ap.add_argument("--logdir", default="logs")
    ap.add_argument("--model", default="ODEConv")
    ap.add_argument("--n_in", type=int, default=10)
    ap.add_argument("--eval_outs", default="10,90")
    ap.add_argument("--eval_videos", type=int, default=32)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--out", default="logs/parity/jax")
    args = ap.parse_args()

    import jax

    from ode_rl_tpu.core.checkpoint import CheckpointManager, find_checkpoint
    from ode_rl_tpu.core.config import Config
    from ode_rl_tpu.data.protocol import make_batch_dict
    from ode_rl_tpu.models import build_model
    from ode_rl_tpu.train.metrics import per_frame_metrics
    from ode_rl_tpu.train.step import make_eval_step

    ckpt_dir = find_checkpoint(args.logdir, args.model, args.ckpt_id)
    ckpt = CheckpointManager(ckpt_dir, tag=args.ckpt_id)
    cfg = Config(ckpt.load_config())
    model = build_model(cfg)
    eval_step = make_eval_step(model)

    # Deterministic eval corpus: videos 0..N-1 of the frozen test split,
    # window starting at frame 0 — identical to torch_parity's .video().
    shards = sorted((pathlib.Path(args.data) / "test").glob("shard_*.npy"))
    videos = np.concatenate([np.load(s) for s in shards])[:args.eval_videos]

    results = {"ckpt_id": args.ckpt_id, "step": ckpt.latest_step()}
    params_restored = None
    out = pathlib.Path(args.out)
    out.mkdir(parents=True, exist_ok=True)

    for n_out in [int(x) for x in args.eval_outs.split(",")]:
        n_tot = args.n_in + n_out
        per = []
        for b0 in range(0, args.eval_videos, args.batch):
            clip = videos[b0:b0 + args.batch, :n_tot]
            video = clip.astype(np.float32)[..., None] / 255.0 - 0.5
            batch = make_batch_dict(jax.numpy.asarray(video), n_in=args.n_in)
            if params_restored is None:
                import jax.numpy as jnp
                from ode_rl_tpu.train.step import create_train_state
                state = create_train_state(model, cfg, batch,
                                           jax.random.key(0))
                restored = ckpt.restore({"params": state.params,
                                         "model_state": state.model_state,
                                         "opt_state": state.opt_state})
                params_restored = {"params": restored["state"]["params"],
                                   **restored["state"]["model_state"]}
                print(f"loaded {args.ckpt_id} step {restored['step']}")
            metrics, _pred = eval_step(params_restored, batch,
                                       jax.random.key(0))
            per.append(jax.device_get(
                {k: np.asarray(v) for k, v in metrics.items()
                 if not k.startswith("aux_")}))
        stacked = {k: np.mean(np.stack([m[k] for m in per]), axis=0)
                   for k in per[0]}
        results[f"{args.n_in}to{n_out}"] = {
            k: v.tolist() for k, v in stacked.items()}
        print(f"{args.n_in}to{n_out}: final-horizon "
              f"mse={stacked['mse'][-1]:.5f} psnr={stacked['psnr'][-1]:.2f} "
              f"ssim={stacked['ssim'][-1]:.4f}")

    (out / "metrics.json").write_text(json.dumps(results, indent=2))
    print("wrote", out / "metrics.json")


if __name__ == "__main__":
    main()
