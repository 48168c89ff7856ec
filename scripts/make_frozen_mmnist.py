#!/usr/bin/env python
"""Materialize the frozen Moving MNIST dataset.

Capability parity with the reference's frozen-mode data pipeline
(reference dataloader.py:105-187 reads pre-rendered ``video_<n>.mp4``
files of 200 frames; data_gen_scripts/ builds them): this writes the
same 10k-video × 200-frame corpus as uint8 ``.npy`` shards (train/test
split 8000/2000 like parse_datasets) using the native C++ generator —
no ffmpeg/cv2 dependency, deterministic in the seed.

    python scripts/make_frozen_mmnist.py --out datasets/MovingMNIST_frozen \
        --videos 10000 --frames 200 --digits 3
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="datasets/MovingMNIST_frozen")
    ap.add_argument("--videos", type=int, default=10000)
    ap.add_argument("--frames", type=int, default=200)
    ap.add_argument("--digits", type=int, default=3)
    ap.add_argument("--shard_size", type=int, default=500)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--train_split", type=float, default=0.8)
    args = ap.parse_args()

    from ode_rl_tpu.data.native_gen import generate_batch, using_native
    from ode_rl_tpu.data.sprites import get_sprite_bank

    out = pathlib.Path(args.out)
    (out / "train").mkdir(parents=True, exist_ok=True)
    (out / "test").mkdir(parents=True, exist_ok=True)
    bank = get_sprite_bank()
    n_train = int(args.videos * args.train_split)

    t0 = time.time()
    written = 0
    shard_id = 0
    while written < args.videos:
        # shards never straddle the train/test boundary
        limit = n_train if written < n_train else args.videos
        n = min(args.shard_size, limit - written)
        frames = generate_batch(bank, seed=args.seed + shard_id,
                                batch=n, n_frames=args.frames,
                                num_digits=args.digits)
        split = "train" if written < n_train else "test"
        np.save(out / split / f"shard_{shard_id:04d}.npy", frames)
        written += n
        shard_id += 1
        rate = written * args.frames / (time.time() - t0)
        print(f"{written}/{args.videos} videos ({rate:.0f} frames/s, "
              f"native={using_native()})", flush=True)

    (out / "meta.json").write_text(json.dumps({
        "videos": args.videos, "frames": args.frames,
        "digits": args.digits, "seed": args.seed,
        "train_videos": n_train, "shard_size": args.shard_size,
    }))
    print("done:", out)


if __name__ == "__main__":
    main()
