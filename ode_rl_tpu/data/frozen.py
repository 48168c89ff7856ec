"""Frozen Moving MNIST loader.

Capability parity with the reference's frozen mode
(reference dataloader.py:105-199: read a pre-rendered 200-frame video,
sample a random window, split observed/predict). Two on-disk layouts:

  * ``.npy`` shards written by scripts/make_frozen_mmnist.py (fast path);
  * the reference's own layout — a directory of ``video_<n>.mp4`` files
    decoded via cv2 with the reference's bounded read-retry loop
    (dataloader.py:119-147), so a user can point ``--data_dir`` at a
    reference-generated corpus directly.

Windows are sampled on the host; uint8→float batches ship to the device.
Per-host sharding partitions shards across processes.
"""

from __future__ import annotations

import json
import pathlib
from typing import Iterator, List

import jax
import jax.numpy as jnp
import numpy as np


def read_video_file(path, retries: int = 10, gray: bool = True) -> np.ndarray:
    """Decode a video file to (T, H, W) uint8 with bounded whole-file
    retries (the reference re-opens the capture when a read fails,
    dataloader.py:119-147, and hard-fails after the retry budget)."""
    import cv2

    last = 0
    for _ in range(retries):
        cap = cv2.VideoCapture(str(path))
        frames = []
        while True:
            ok, img = cap.read()
            if not ok:
                break
            if gray:
                img = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)
            else:
                img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
            frames.append(img.astype(np.uint8))
        cap.release()
        if frames and len(frames) >= last:
            return np.stack(frames)
        last = len(frames)
    raise IOError(f"failed to decode {path} after {retries} attempts")


def _load_mp4_corpus(split_dir: pathlib.Path) -> np.ndarray:
    """Decode every ``video_<n>.mp4`` under split_dir → one in-memory
    shard (n_videos, n_frames, H, W) uint8, truncated to the shortest
    video so windows stay rectangular."""
    vids = sorted(split_dir.glob("video_*.mp4"))
    decoded = [read_video_file(p) for p in vids]
    t_min = min(v.shape[0] for v in decoded)
    return np.stack([v[:t_min] for v in decoded])


class FrozenMovingMNIST:
    def __init__(self, root, batch_size: int, n_frames_input: int,
                 n_frames_output: int, is_train: bool = True,
                 seed: int = 0):
        self.root = pathlib.Path(root)
        split = "train" if is_train else "test"
        self.shards: List[pathlib.Path] = sorted(
            (self.root / split).glob("shard_*.npy"))
        self._mp4_shard = None
        if not self.shards:
            # Reference layout: video_<n>.mp4 under <root>/<split>/ (or a
            # flat directory of videos used for both splits).
            for cand in (self.root / split, self.root):
                if sorted(cand.glob("video_*.mp4")):
                    self._mp4_shard = _load_mp4_corpus(cand)
                    break
        if not self.shards and self._mp4_shard is None:
            raise FileNotFoundError(
                f"no frozen shards under {self.root / split} and no "
                f"video_*.mp4 corpus under {self.root}; run "
                "scripts/make_frozen_mmnist.py or scripts/make_mp4_mmnist.py "
                "first")
        # multi-host: each process reads a disjoint subset of shards
        n_proc = jax.process_count()
        self.shards = self.shards[jax.process_index()::n_proc] or self.shards
        meta_path = self.root / "meta.json"
        self.meta = (json.loads(meta_path.read_text())
                     if meta_path.exists() else {})
        self.batch_size = batch_size
        self.n_total = n_frames_input + n_frames_output
        self._rng = np.random.RandomState(seed + jax.process_index())
        self._cache_path = None
        self._cache = None

    def _shard(self, path) -> np.ndarray:
        if self._cache_path != path:
            self._cache = np.load(path, mmap_mode="r")
            self._cache_path = path
        return self._cache

    def __iter__(self) -> Iterator[jnp.ndarray]:
        return self

    def __next__(self) -> jnp.ndarray:
        shard = (self._mp4_shard if self._mp4_shard is not None else
                 self._shard(self.shards[self._rng.randint(len(self.shards))]))
        n_videos, n_frames = shard.shape[:2]
        vids = self._rng.randint(0, n_videos, self.batch_size)
        starts = self._rng.randint(0, n_frames - self.n_total + 1,
                                   self.batch_size)
        batch = np.stack([
            shard[v, s:s + self.n_total] for v, s in zip(vids, starts)])
        video = batch.astype(np.float32)[..., None] / 255.0 - 0.5
        return jnp.asarray(video)
