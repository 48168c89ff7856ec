"""Sprites dataset: real-data loader + procedural fallback.

Capability parity with the reference's Sprites pipeline
(/root/reference/code_sprite/Sprites/frame_to_npy.py + load_sprites.py):
the reference renders character PNG sheets into (N, 8, 64, 64, 3) clips
with action and attribute labels. Those assets are not in this image, so
this module loads real ``.npy`` clip/label files when present and
otherwise generates procedural labeled sprite videos on device —
colored shapes with an attribute (color id) and an action (motion
pattern id) — preserving the judge-classifier protocol (a sequence whose
content is its attributes and whose motion is its action).
"""

from __future__ import annotations

import functools
import pathlib
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

N_ACTIONS = 4    # right, down, diagonal, circle
N_COLORS = 6


def _shape_sprite(color_id: int) -> np.ndarray:
    """15×15 RGB square sprite with one of N_COLORS colors."""
    palette = np.array([
        [1.0, 0.2, 0.2], [0.2, 1.0, 0.2], [0.2, 0.4, 1.0],
        [1.0, 1.0, 0.2], [1.0, 0.2, 1.0], [0.2, 1.0, 1.0],
    ], dtype=np.float32)
    sprite = np.zeros((15, 15, 3), np.float32)
    sprite[2:13, 2:13] = palette[color_id]
    return sprite


@functools.lru_cache(maxsize=1)
def _sprite_bank() -> np.ndarray:
    return np.stack([_shape_sprite(i) for i in range(N_COLORS)])


@functools.partial(jax.jit, static_argnames=("batch", "n_frames"))
def sprites_batch(key: jax.Array, batch: int, n_frames: int = 8
                  ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """→ (video (B,T,64,64,3) in [-0.5,0.5], action (B,), color (B,))."""
    bank = jnp.asarray(_sprite_bank())
    k1, k2, k3 = jax.random.split(key, 3)
    colors = jax.random.randint(k1, (batch,), 0, N_COLORS)
    actions = jax.random.randint(k2, (batch,), 0, N_ACTIONS)
    phase = jax.random.uniform(k3, (batch,)) * 2 * jnp.pi

    t = jnp.arange(n_frames, dtype=jnp.float32)

    def trajectory(action, ph):
        lin = 10.0 + 4.0 * t
        # action ∈ {right, down, diagonal, circle}
        xs = jnp.stack([lin, jnp.full_like(t, 24.0), lin,
                        24.0 + 16.0 * jnp.cos(ph + t)], 0)
        ys = jnp.stack([jnp.full_like(t, 24.0), lin, lin,
                        24.0 + 16.0 * jnp.sin(ph + t)], 0)
        return (jnp.take(ys, action, axis=0).astype(jnp.int32),
                jnp.take(xs, action, axis=0).astype(jnp.int32))

    def render(color, action, ph):
        sprite = bank[color]
        yy, xx = trajectory(action, ph)

        def place(y, x):
            canvas = jnp.zeros((64, 64, 3), jnp.float32)
            y = jnp.clip(y, 0, 64 - 15)
            x = jnp.clip(x, 0, 64 - 15)
            return jax.lax.dynamic_update_slice(canvas, sprite, (y, x, 0))

        return jax.vmap(place)(yy, xx)

    video = jax.vmap(render)(colors, actions, phase)
    return video - 0.5, actions, colors


class SpritesLoader:
    """Infinite labeled sprite-video stream (real .npy data if found)."""

    def __init__(self, batch_size: int, n_frames: int = 8,
                 data_dir: Optional[str] = None, seed: int = 0):
        self.batch_size = batch_size
        self.n_frames = n_frames
        self._real = None
        if data_dir is not None:
            path = pathlib.Path(data_dir)
            clips = path / "sprites_clips.npy"
            labels = path / "sprites_labels.npy"
            if clips.exists() and labels.exists():
                self._real = (np.load(clips), np.load(labels))
        self._key = jax.random.key(seed)
        self._pos = 0

    def __iter__(self):
        return self

    def __next__(self):
        if self._real is not None:
            clips, labels = self._real
            idx = (np.arange(self.batch_size) + self._pos) % len(clips)
            self._pos += self.batch_size
            video = jnp.asarray(clips[idx], jnp.float32) - 0.5
            lab = jnp.asarray(labels[idx])
            return video, lab[..., 0], lab[..., 1]
        self._key, sub = jax.random.split(self._key)
        return sprites_batch(sub, self.batch_size, self.n_frames)
