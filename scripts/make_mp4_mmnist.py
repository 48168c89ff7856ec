#!/usr/bin/env python
"""Render a Moving MNIST corpus as ``video_<n>.mp4`` files — the
reference's frozen-mode on-disk layout (reference dataloader.py:105-147
reads exactly this: per-video mp4s decoded with cv2 + bounded retry).

    python scripts/make_mp4_mmnist.py --out /tmp/mp4_mmnist \
        --videos 40 --frames 60 [--test_videos 8] [--fps 10]

Writes <out>/train/video_<n>.mp4 and <out>/test/video_<n>.mp4. Train
frozen-mode directly on it:

    python main.py --configs defaults train_mmnist_cgru_len20 \
        --frozen True --data_dir <out>
"""

from __future__ import annotations

import argparse
import pathlib
import os
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

# Honor JAX_PLATFORMS=cpu even under this image's axon sitecustomize,
# which registers the TPU tunnel regardless of the env var — the config
# update must land before any backend initializes (the tests' mp4
# fixture spawns this script and must never queue on the TPU).
if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
    import jax

    jax.config.update("jax_platforms", "cpu")


def write_split(out_dir: pathlib.Path, n_videos: int, frames: int,
                fps: int, seed: int) -> None:
    import cv2
    import jax

    from ode_rl_tpu.data.mmnist import generate_moving_mnist
    from ode_rl_tpu.data.sprites import get_sprite_bank

    out_dir.mkdir(parents=True, exist_ok=True)
    bank = get_sprite_bank()
    key = jax.random.key(seed)
    done = 0
    while done < n_videos:
        key, sub = jax.random.split(key)
        b = min(8, n_videos - done)
        vids = generate_moving_mnist(sub, bank, batch=8, n_frames=frames,
                                     num_digits=3)
        vids = np.asarray((vids + 0.5) * 255.0).clip(0, 255).astype(np.uint8)
        for i in range(b):
            path = out_dir / f"video_{done + i}.mp4"
            w = cv2.VideoWriter(str(path),
                                cv2.VideoWriter_fourcc(*"mp4v"), fps,
                                (vids.shape[3], vids.shape[2]))
            if not w.isOpened():
                raise IOError(f"VideoWriter failed for {path}")
            for t in range(frames):
                gray = vids[i, t, :, :, 0]
                w.write(cv2.cvtColor(gray, cv2.COLOR_GRAY2BGR))
            w.release()
        done += b
    print(f"wrote {n_videos} mp4 videos ({frames} frames) → {out_dir}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--videos", type=int, default=40)
    ap.add_argument("--test_videos", type=int, default=8)
    ap.add_argument("--frames", type=int, default=60)
    ap.add_argument("--fps", type=int, default=10)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    out = pathlib.Path(args.out)
    write_split(out / "train", args.videos, args.frames, args.fps, args.seed)
    write_split(out / "test", args.test_videos, args.frames, args.fps,
                args.seed + 1)


if __name__ == "__main__":
    main()
