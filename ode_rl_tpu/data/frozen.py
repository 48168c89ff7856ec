"""Frozen Moving MNIST loader.

Capability parity with the reference's frozen mode
(reference dataloader.py:105-199: read a pre-rendered 200-frame video,
sample a random window, split observed/predict): reads the ``.npy``
shards written by scripts/make_frozen_mmnist.py, samples windows on the
host, and ships uint8→float batches to the device. Per-host sharding
partitions shards across processes.
"""

from __future__ import annotations

import json
import pathlib
from typing import Iterator, List

import jax
import jax.numpy as jnp
import numpy as np


class FrozenMovingMNIST:
    def __init__(self, root, batch_size: int, n_frames_input: int,
                 n_frames_output: int, is_train: bool = True,
                 seed: int = 0):
        self.root = pathlib.Path(root)
        split = "train" if is_train else "test"
        self.shards: List[pathlib.Path] = sorted(
            (self.root / split).glob("shard_*.npy"))
        if not self.shards:
            raise FileNotFoundError(
                f"no frozen shards under {self.root / split}; run "
                "scripts/make_frozen_mmnist.py first")
        # multi-host: each process reads a disjoint subset of shards
        n_proc = jax.process_count()
        self.shards = self.shards[jax.process_index()::n_proc] or self.shards
        self.meta = json.loads((self.root / "meta.json").read_text())
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
        shard = self._shard(self.shards[self._rng.randint(len(self.shards))])
        n_videos, n_frames = shard.shape[:2]
        vids = self._rng.randint(0, n_videos, self.batch_size)
        starts = self._rng.randint(0, n_frames - self.n_total + 1,
                                   self.batch_size)
        batch = np.stack([
            shard[v, s:s + self.n_total] for v, s in zip(vids, starts)])
        video = batch.astype(np.float32)[..., None] / 255.0 - 0.5
        return jnp.asarray(video)
