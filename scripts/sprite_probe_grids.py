#!/usr/bin/env python
"""DS-VAE disentanglement probe grids from a trained checkpoint.

The reference's evaluation of the sprites DS-VAE is visual + probe-based
(/root/reference/code_sprite/models/DS_VAE.py:239-355: forward_exchange,
forward_fixed_motion, forward_fixed_content, generating). This script
loads the checkpoint a `train_sprite_dsvae` run wrote and dumps one
filmstrip per probe: swapped content/motion between two videos, frozen
motion, frozen content, and free generation from the learned LSTM prior.

Usage:
    python scripts/sprite_probe_grids.py [--ckpt_id train_sprite_dsvae]
        [--out results/round3/dsvae_probes]
"""

from __future__ import annotations

import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt_id", default="train_sprite_dsvae")
    ap.add_argument("--logdir", default="logs")
    ap.add_argument("--out", default="results/round3/dsvae_probes")
    ap.add_argument("--batch", type=int, default=4)
    args = ap.parse_args()

    import jax
    import numpy as np

    from ode_rl_tpu.core.checkpoint import CheckpointManager, find_checkpoint
    from ode_rl_tpu.core.config import Config
    from ode_rl_tpu.sprite.data import sprites_batch
    from ode_rl_tpu.models import build_model
    from ode_rl_tpu.train.visualize import save_filmstrip

    ckpt_dir = find_checkpoint(args.logdir, "DSVAE", args.ckpt_id)
    ckpt = CheckpointManager(ckpt_dir, tag=args.ckpt_id)
    cfg = Config(ckpt.load_config())
    model = build_model(cfg)

    key = jax.random.key(0)
    video, _action, _color = sprites_batch(key, batch=args.batch,
                                           n_frames=int(cfg.train_in_seq))
    batch = {"observed_data": video}

    init_vars = model.init({"params": jax.random.key(0),
                            "sample": jax.random.key(1)}, batch,
                           method=model.loss)
    model_state = {k: v for k, v in init_vars.items() if k != "params"}
    restored = ckpt.restore({"params": init_vars["params"],
                             "model_state": model_state})
    variables = {"params": restored["state"]["params"],
                 **restored["state"]["model_state"]}
    print(f"loaded {args.ckpt_id} step {restored['step']} from {ckpt_dir}")

    out = pathlib.Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    rngs = {"sample": jax.random.key(2)}
    x = np.asarray(video, np.float32) + 0.5   # probes take [0,1] frames

    for probe in ("forward_exchange", "forward_fixed_motion",
                  "forward_fixed_content", "forward_generating"):
        y = model.apply(variables, x, method=getattr(model, probe),
                        rngs=rngs)
        y = np.asarray(y, np.float32)
        strips = [np.asarray(x[i]) for i in range(min(2, args.batch))]
        strips += [y[i] for i in range(min(2, y.shape[0]))]
        save_filmstrip(out / f"{probe}.png", strips,
                       labels=["input 0", "input 1", f"{probe} 0",
                               f"{probe} 1"][: len(strips)])
        print(f"wrote {out / (probe + '.png')}")


if __name__ == "__main__":
    main()
