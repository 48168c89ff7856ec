"""Vid-ODE sequence samplers: regular/irregular × interp/extrap.

Capability parity with /root/reference/Vid-ODE/dataloader.py:31-158 and
the batch split in utils.split_and_subsample_batch
(/root/reference/Vid-ODE/utils.py:191-208):
  * regular interpolation — train on every-2nd frame of a window; test
    sees the full window with a mask marking the even frames observed;
  * regular extrapolation — a contiguous window, all frames observed;
  * irregular interpolation — a window with first+last frames fixed and
    the interior frames randomly kept (mask), matching sample_size;
  * irregular extrapolation — random subsets in each half of the window
    with the endpoints fixed.

TPU-first: samplers are jittable PRNG-keyed functions producing
fixed-shape (video, mask) pairs — variable observation patterns live in
the mask, not in data shapes, so every configuration compiles once.
The mask gates the ConvGRU encoder steps (VidODE supports this path).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def _random_subset_mask(key, lo: int, hi: int, k: int, size: int):
    """Mask of length `size` with exactly k of positions [lo, hi) set,
    chosen uniformly (on-device choice-without-replacement)."""
    scores = jax.random.uniform(key, (size,))
    in_range = (jnp.arange(size) >= lo) & (jnp.arange(size) < hi)
    scores = jnp.where(in_range, scores, -jnp.inf)
    thresh = jnp.sort(scores)[-k] if k > 0 else jnp.inf
    return (scores >= thresh) & in_range


def sample_regular_interp(key, video: jnp.ndarray, sample_size: int,
                          train: bool = True
                          ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """video: (B, T, H, W, C). Train: every-2nd frame of a random window
    (all observed). Test: full window, even frames observed."""
    b, t = video.shape[:2]
    k1 = key
    if train:
        start = jax.random.randint(k1, (b,), 0, t - sample_size + 1)
        idx = start[:, None] + jnp.arange(0, sample_size, 2)[None]
        frames = jnp.take_along_axis(
            video, idx[:, :, None, None, None], axis=1)
        mask = jnp.ones((b, sample_size // 2), video.dtype)
        return frames, mask
    frames = video[:, :sample_size]
    mask = jnp.zeros((b, sample_size), video.dtype)
    mask = mask.at[:, ::2].set(1.0)
    return frames, mask


def sample_regular_extrap(key, video: jnp.ndarray, sample_size: int,
                          train: bool = True
                          ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    b, t = video.shape[:2]
    if train:
        start = jax.random.randint(key, (b,), 0, t - sample_size + 1)
    else:
        start = jnp.zeros((b,), jnp.int32)
    idx = start[:, None] + jnp.arange(sample_size)[None]
    frames = jnp.take_along_axis(video, idx[:, :, None, None, None], axis=1)
    mask = jnp.ones((b, sample_size), video.dtype)
    return frames, mask


def sample_irregular_interp(key, video: jnp.ndarray, sample_size: int,
                            window_size: int, train: bool = True
                            ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Window of window_size frames; first+last observed, sample_size-2
    random interior frames observed (mask)."""
    b, t = video.shape[:2]
    k1, k2 = jax.random.split(key)
    if train and t > window_size:
        start = jax.random.randint(k1, (b,), 0, t - window_size)
    else:
        start = jnp.zeros((b,), jnp.int32)
    idx = start[:, None] + jnp.arange(window_size)[None]
    frames = jnp.take_along_axis(video, idx[:, :, None, None, None], axis=1)

    keys = jax.random.split(k2, b)
    interior = jax.vmap(
        lambda k: _random_subset_mask(k, 1, window_size - 1,
                                      sample_size - 2, window_size))(keys)
    mask = interior.astype(video.dtype)
    mask = mask.at[:, 0].set(1.0).at[:, window_size - 1].set(1.0)
    return frames, mask


def sample_irregular_extrap(key, video: jnp.ndarray, sample_size: int,
                            window_size: int, train: bool = True
                            ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Both halves of the window get half_sample-1 random frames plus the
    fixed endpoints."""
    assert window_size % 2 == 0 and sample_size % 2 == 0
    b, t = video.shape[:2]
    half_w, half_s = window_size // 2, sample_size // 2
    k1, k2, k3 = jax.random.split(key, 3)
    if train and t > window_size:
        start = jax.random.randint(k1, (b,), 0, t - window_size)
    else:
        start = jnp.zeros((b,), jnp.int32)
    idx = start[:, None] + jnp.arange(window_size)[None]
    frames = jnp.take_along_axis(video, idx[:, :, None, None, None], axis=1)

    keys_in = jax.random.split(k2, b)
    keys_out = jax.random.split(k3, b)
    m_in = jax.vmap(lambda k: _random_subset_mask(
        k, 1, half_w, half_s - 1, window_size))(keys_in)
    m_out = jax.vmap(lambda k: _random_subset_mask(
        k, half_w, window_size - 1, half_s - 1, window_size))(keys_out)
    mask = (m_in | m_out).astype(video.dtype)
    mask = mask.at[:, 0].set(1.0).at[:, window_size - 1].set(1.0)
    return frames, mask


def sample(key, video, sample_size: int, window_size: int = 20,
           irregular: bool = False, extrap: bool = True,
           train: bool = True):
    """Dispatch matching the reference's ``sampling`` (dataloader.py:148)."""
    if not irregular and not extrap:
        return sample_regular_interp(key, video, sample_size, train)
    if not irregular and extrap:
        return sample_regular_extrap(key, video, sample_size, train)
    if irregular and not extrap:
        return sample_irregular_interp(key, video, sample_size,
                                       window_size, train)
    return sample_irregular_extrap(key, video, sample_size, window_size,
                                   train)


def split_batch(frames: jnp.ndarray, mask: jnp.ndarray, extrap: bool):
    """split_and_subsample_batch equivalence: extrapolation splits the
    window in half (observe first half, predict second); interpolation
    observes the masked frames and predicts the full window."""
    t = frames.shape[1]
    if extrap:
        half = t // 2
        return {
            "observed_data": frames[:, :half],
            "data_to_predict": frames[:, half:],
            "observed_mask": mask[:, :half],
            "mask_predicted_data": mask[:, half:],
            "observed_tp": jnp.arange(0, half, dtype=jnp.float32) / t,
            "tp_to_predict": jnp.arange(half, t, dtype=jnp.float32) / t,
        }
    ts = jnp.arange(0, t, dtype=jnp.float32) / t
    return {
        "observed_data": frames * mask[:, :, None, None, None],
        "data_to_predict": frames,
        "observed_mask": mask,
        "mask_predicted_data": jnp.ones_like(mask),
        "observed_tp": ts,
        "tp_to_predict": ts,
    }
