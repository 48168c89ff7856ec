#!/usr/bin/env python
"""Generate a PHYRE rollout corpus in the per-video npy layout.

Capability parity with
/root/reference/Vid-ODE/scripts/generate_phyre_dataset.py (phyre simulator
rollouts rendered to frame stacks). The ``phyre`` package is not in this
image, so: with phyre installed this runs real task rollouts; without it,
``--synthetic`` (default when phyre is missing) produces physics-shaped
stand-ins — balls under gravity with wall/floor bounces rendered at
PHYRE's 64×64 RGB in PHYRE-like colors — so the full data path is
exercisable end-to-end.

    python scripts/generate_phyre_dataset.py --out datasets/phyre
"""

from __future__ import annotations

import argparse
import pathlib

import numpy as np

try:
    import phyre  # type: ignore
except ImportError:
    phyre = None


def synthetic_rollout(rng: np.random.RandomState, t: int = 40,
                      size: int = 64) -> np.ndarray:
    """Balls under gravity with restitution — PHYRE-like dynamics."""
    n = rng.randint(1, 4)
    pos = rng.rand(n, 2) * [size * 0.4, size - 12] + [4, 6]
    vel = (rng.rand(n, 2) - 0.5) * [2, 6]
    radius = rng.randint(3, 7, n)
    # PHYRE palette-ish colors: red/green/blue/gray balls on white
    colors = np.array([[220, 40, 40], [40, 160, 60], [50, 80, 220],
                       [120, 120, 120]], np.float32)[
        rng.randint(0, 4, n)]
    g = 0.6
    yy, xx = np.mgrid[0:size, 0:size]
    frames = np.empty((t, size, size, 3), np.uint8)
    for ti in range(t):
        img = np.full((size, size, 3), 255, np.float32)
        for i in range(n):
            d2 = (yy - pos[i, 0]) ** 2 + (xx - pos[i, 1]) ** 2
            m = (d2 <= radius[i] ** 2)[..., None]
            img = np.where(m, colors[i], img)
        frames[ti] = img.astype(np.uint8)
        vel[:, 0] += g
        pos += vel
        for i in range(n):
            if pos[i, 0] > size - radius[i] - 1:        # floor bounce
                pos[i, 0] = size - radius[i] - 1
                vel[i, 0] *= -0.8
            for ax, lim in ((1, size - radius[i] - 1),):
                if pos[i, ax] < radius[i] or pos[i, ax] > lim:
                    vel[i, ax] *= -1
                    pos[i, ax] = np.clip(pos[i, ax], radius[i], lim)
    return frames


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="datasets/phyre")
    ap.add_argument("--train_videos", type=int, default=40)
    ap.add_argument("--test_videos", type=int, default=8)
    ap.add_argument("--frames", type=int, default=40)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--synthetic", action="store_true",
                    help="force the synthetic simulator even with phyre")
    args = ap.parse_args()

    synthetic = args.synthetic or phyre is None
    if not synthetic:
        # Real PHYRE path: cross-template task rollouts (matches the
        # reference generator's use of the simulation API).
        sim = phyre.initialize_simulator(
            phyre.get_fold(phyre.MAIN_EVAL_SETUP, 0)[0], "ball")
    rng = np.random.RandomState(args.seed)
    out = pathlib.Path(args.out)
    for split, count in (("train", args.train_videos),
                         ("test", args.test_videos)):
        d = out / split
        d.mkdir(parents=True, exist_ok=True)
        for i in range(count):
            if synthetic:
                video = synthetic_rollout(rng, t=args.frames)
            else:
                task = rng.randint(0, len(sim.task_ids))
                action = sim.sample()
                status, images = sim.simulate_single(
                    task, action, need_images=True, stride=5)
                video = np.stack([
                    phyre.observations_to_uint8_rgb(im) for im in images])
            np.save(d / f"rollout_{i:05d}.npy", video)
        print(f"{split}: {count} rollouts → {d} "
              f"({'synthetic' if synthetic else 'phyre'})")


if __name__ == "__main__":
    main()
