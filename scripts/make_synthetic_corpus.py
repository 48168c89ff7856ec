#!/usr/bin/env python
"""Build a synthetic stand-in corpus shaped like one of the Vid-ODE
external datasets (kth/mgif/penn/hurricane/phyre/minerl), as per-video
``.npy`` files under <out>/{train,test}/ — the exact layout
ode_rl_tpu.data.video_corpus.VideoCorpus reads and the reference's
VideoDataset expects (/root/reference/Vid-ODE/dataloader.py:225-340).

The source datasets are not distributable in this image; the synthetic
videos carry dataset-matched geometry (resolution, channels, length
distribution) with simple moving-shape dynamics so every downstream
pipeline (samplers, transforms, VidODE training, eval) runs end-to-end.

    python scripts/make_synthetic_corpus.py --dataset kth --out datasets/kth
"""

from __future__ import annotations

import argparse
import pathlib

import numpy as np

# (raw H, raw W, channels, min/max video length) per dataset — the raw
# sizes the reference transforms FROM (kth 120×160 CenterCrop(120),
# hurricane gets Pad(1,0) → width 63+2).
RAW_SPECS = {
    "kth": dict(h=120, w=160, c=1, tmin=40, tmax=120),
    "mgif": dict(h=128, w=128, c=3, tmin=12, tmax=60),
    "penn": dict(h=160, w=160, c=3, tmin=30, tmax=90),
    "phyre": dict(h=64, w=64, c=3, tmin=40, tmax=40),
    "minerl": dict(h=64, w=64, c=3, tmin=100, tmax=100),
    "hurricane": dict(h=65, w=63, c=6, tmin=30, tmax=60),
}


def render_video(rng: np.random.RandomState, h: int, w: int, c: int,
                 t: int) -> np.ndarray:
    """Moving-blob video: n circles bounce with constant velocity; each
    channel mixes the blobs with channel-specific gains so multi-channel
    datasets (hurricane's stacked fields) aren't trivially redundant."""
    n = rng.randint(1, 4)
    pos = rng.rand(n, 2) * [h - 16, w - 16] + 8
    vel = (rng.rand(n, 2) - 0.5) * 6
    radius = rng.randint(5, 12, n)
    gains = 0.5 + rng.rand(c, n)
    yy, xx = np.mgrid[0:h, 0:w]
    frames = np.zeros((t, h, w, c), np.uint8)
    for ti in range(t):
        canvas = np.zeros((h, w, n), np.float32)
        for i in range(n):
            d2 = (yy - pos[i, 0]) ** 2 + (xx - pos[i, 1]) ** 2
            canvas[..., i] = np.exp(-d2 / (2 * radius[i] ** 2))
        img = np.einsum("hwn,cn->hwc", canvas, gains)
        frames[ti] = np.clip(img * 255, 0, 255).astype(np.uint8)
        pos += vel
        for i in range(n):
            for ax, lim in ((0, h - 8), (1, w - 8)):
                if pos[i, ax] < 8 or pos[i, ax] > lim:
                    vel[i, ax] *= -1
                    pos[i, ax] = np.clip(pos[i, ax], 8, lim)
    return frames


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", required=True, choices=sorted(RAW_SPECS))
    ap.add_argument("--out", default=None)
    ap.add_argument("--train_videos", type=int, default=40)
    ap.add_argument("--test_videos", type=int, default=8)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    spec = RAW_SPECS[args.dataset]
    out = pathlib.Path(args.out or f"datasets/{args.dataset}")
    rng = np.random.RandomState(args.seed)
    for split, count in (("train", args.train_videos),
                         ("test", args.test_videos)):
        d = out / split
        d.mkdir(parents=True, exist_ok=True)
        for i in range(count):
            t = rng.randint(spec["tmin"], spec["tmax"] + 1)
            video = render_video(rng, spec["h"], spec["w"], spec["c"], t)
            np.save(d / f"video_{i:05d}.npy", video)
        print(f"{split}: {count} videos → {d}")


if __name__ == "__main__":
    main()
