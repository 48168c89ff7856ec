"""Video-level augmentation transforms.

Capability parity with /root/reference/Vid-ODE/video_transforms.py:13-413
(Scale, CenterCrop, Pad, RandomCrop, RandomHorizontalFlip,
RandomRotation, ColorJitter, Cutout, Normalize — each applied
consistently across all frames of a clip).

TPU-first: every transform is a pure jittable function over a whole
(T, H, W, C) clip (or batched (B, T, H, W, C) via vmap) with explicit
PRNG keys; random parameters are drawn once per clip so the whole video
gets the same augmentation, exactly like the reference's video-level
semantics.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def scale(clip: jnp.ndarray, size: Tuple[int, int],
          method: str = "bilinear") -> jnp.ndarray:
    t, h, w, c = clip.shape
    return jax.image.resize(clip, (t, size[0], size[1], c), method)


def center_crop(clip: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    t, h, w, c = clip.shape
    th, tw = size
    y0 = (h - th) // 2
    x0 = (w - tw) // 2
    return clip[:, y0:y0 + th, x0:x0 + tw]


def pad(clip: jnp.ndarray, padding: int, value: float = 0.0) -> jnp.ndarray:
    return jnp.pad(clip, ((0, 0), (padding, padding), (padding, padding),
                          (0, 0)), constant_values=value)


def random_crop(key, clip: jnp.ndarray, size: Tuple[int, int]
                ) -> jnp.ndarray:
    t, h, w, c = clip.shape
    th, tw = size
    ky, kx = jax.random.split(key)
    y0 = jax.random.randint(ky, (), 0, h - th + 1)
    x0 = jax.random.randint(kx, (), 0, w - tw + 1)
    return jax.lax.dynamic_slice(clip, (0, y0, x0, 0), (t, th, tw, c))


def random_horizontal_flip(key, clip: jnp.ndarray, p: float = 0.5
                           ) -> jnp.ndarray:
    flip = jax.random.uniform(key) < p
    return jnp.where(flip, clip[:, :, ::-1], clip)


def random_rotation(key, clip: jnp.ndarray, degrees: float = 10.0
                    ) -> jnp.ndarray:
    """Rotate all frames by one random angle (bilinear, border clamp)."""
    from ode_rl_tpu.ops.warp import grid_sample

    t, h, w, c = clip.shape
    angle = jax.random.uniform(key, (), minval=-degrees, maxval=degrees)
    theta = angle * jnp.pi / 180.0
    ys, xs = jnp.meshgrid(jnp.linspace(-1, 1, h), jnp.linspace(-1, 1, w),
                          indexing="ij")
    gx = jnp.cos(theta) * xs - jnp.sin(theta) * ys
    gy = jnp.sin(theta) * xs + jnp.cos(theta) * ys
    grid = jnp.stack([gx, gy], -1)[None].repeat(t, axis=0)
    return grid_sample(clip, grid)


def color_jitter(key, clip: jnp.ndarray, brightness: float = 0.2,
                 contrast: float = 0.2, saturation: float = 0.2
                 ) -> jnp.ndarray:
    """One jitter draw per clip (expects [0, 1] input)."""
    kb, kc, ks = jax.random.split(key, 3)
    b = 1.0 + jax.random.uniform(kb, (), minval=-brightness,
                                 maxval=brightness)
    c = 1.0 + jax.random.uniform(kc, (), minval=-contrast, maxval=contrast)
    s = 1.0 + jax.random.uniform(ks, (), minval=-saturation,
                                 maxval=saturation)
    out = clip * b
    mean = out.mean(axis=(1, 2, 3), keepdims=True)
    out = (out - mean) * c + mean
    gray = out.mean(axis=-1, keepdims=True)
    out = (out - gray) * s + gray
    return jnp.clip(out, 0.0, 1.0)


def cutout(key, clip: jnp.ndarray, size: int = 16) -> jnp.ndarray:
    """Zero one size×size patch at the same place in every frame."""
    t, h, w, c = clip.shape
    ky, kx = jax.random.split(key)
    y0 = jax.random.randint(ky, (), 0, h - size + 1)
    x0 = jax.random.randint(kx, (), 0, w - size + 1)
    yy = jnp.arange(h)[:, None]
    xx = jnp.arange(w)[None, :]
    hole = ((yy >= y0) & (yy < y0 + size)
            & (xx >= x0) & (xx < x0 + size))
    return clip * (1.0 - hole[None, :, :, None].astype(clip.dtype))


def normalize(clip: jnp.ndarray, mean: Sequence[float],
              std: Sequence[float]) -> jnp.ndarray:
    mean = jnp.asarray(mean, clip.dtype)
    std = jnp.asarray(std, clip.dtype)
    return (clip - mean) / std


def compose(key, clip: jnp.ndarray, transforms) -> jnp.ndarray:
    """Apply a list of (fn, kwargs) with independent keys per transform;
    deterministic fns are passed without a key."""
    import inspect

    keys = jax.random.split(key, len(transforms))
    for k, (fn, kwargs) in zip(keys, transforms):
        params = inspect.signature(fn).parameters
        if "key" in params:
            clip = fn(k, clip, **kwargs)
        else:
            clip = fn(clip, **kwargs)
    return clip
