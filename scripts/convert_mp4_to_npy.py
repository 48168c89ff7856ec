#!/usr/bin/env python
"""Convert a directory of video files (mp4/avi/gif) into the per-video
``.npy`` corpus layout VideoCorpus reads.

Capability parity with /root/reference/Vid-ODE/scripts/convert_mp4_to_npy.py
(cv2 frame dump → stacked npy), with the reference dataloader's bounded
read-retry behavior (dataloader.py:299-324) and optional grayscale /
resize applied at conversion time so training-time transforms stay cheap.

    python scripts/convert_mp4_to_npy.py --src raw_videos/ --out datasets/kth \
        --split 0.8 [--gray] [--size 0] [--max_frames 0]
"""

from __future__ import annotations

import argparse
import pathlib
import sys

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover - cv2 is present in this image
    cv2 = None

VIDEO_EXTS = {".mp4", ".avi", ".gif", ".mov", ".webm"}


def read_video(path: pathlib.Path, gray: bool, size: int,
               max_frames: int, retries: int = 10) -> np.ndarray:
    cap = cv2.VideoCapture(str(path))
    frames = []
    misses = 0
    while True:
        ok, img = cap.read()
        if not ok:
            # bounded retry like the reference's flaky-decode loop
            misses += 1
            if misses > retries or (max_frames and len(frames) >= max_frames):
                break
            cap = cv2.VideoCapture(str(path))
            for _ in range(len(frames) + 1):
                ok, img = cap.read()
            if not ok:
                break
        misses = 0
        if gray:
            img = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)[..., None]
        else:
            img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        if size:
            img = cv2.resize(img, (size, size))
            if img.ndim == 2:
                img = img[..., None]
        frames.append(img.astype(np.uint8))
        if max_frames and len(frames) >= max_frames:
            break
    cap.release()
    if not frames:
        raise IOError(f"no frames decoded from {path}")
    return np.stack(frames)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--split", type=float, default=0.8)
    ap.add_argument("--gray", action="store_true")
    ap.add_argument("--size", type=int, default=0, help="0 = keep native")
    ap.add_argument("--max_frames", type=int, default=0)
    args = ap.parse_args()

    if cv2 is None:
        sys.exit("cv2 is required for video decoding and is not installed")

    src = pathlib.Path(args.src)
    files = sorted(p for p in src.rglob("*") if p.suffix.lower() in VIDEO_EXTS)
    if not files:
        sys.exit(f"no video files under {src}")
    out = pathlib.Path(args.out)
    n_train = int(len(files) * args.split)
    for i, f in enumerate(files):
        split = "train" if i < n_train else "test"
        d = out / split
        d.mkdir(parents=True, exist_ok=True)
        try:
            video = read_video(f, args.gray, args.size, args.max_frames)
        except IOError as e:
            print(f"skip {f}: {e}")
            continue
        np.save(d / f"{f.stem}.npy", video)
        print(f"[{i + 1}/{len(files)}] {f.name} → {split}/ {video.shape}")


if __name__ == "__main__":
    main()
