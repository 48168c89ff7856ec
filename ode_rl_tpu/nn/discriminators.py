"""PatchGAN-style discriminators and LSGAN losses for Vid-ODE training.

Capability parity with /root/reference/Vid-ODE/models/gan.py:27-159:
  * Discriminator — 4×4 conv stack (64→128→256 stride-2, 512 stride-1,
    last conv → 64 ch patch logits) with InstanceNorm + LeakyReLU(0.2);
  * LSGAN losses — D: ½·[(D(real)−1)² + D(fake)²]; G: (D(fake)−1)²;
  * sequence rearrangement — the sequence discriminator sees sliding
    channel-stacked windows mixing the real context tail with fake
    prefixes (extrapolation, reference :94-136) or identity-masked
    single-frame swaps (interpolation, :138-159).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


def _instance_norm(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Per-sample, per-channel normalization over (H, W); no affine —
    torch InstanceNorm2d defaults."""
    mean = x.mean(axis=(1, 2), keepdims=True)
    var = x.var(axis=(1, 2), keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)


class PatchDiscriminator(nn.Module):
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """(B, H, W, C) → patch logits."""
        lrelu = lambda v: jax.nn.leaky_relu(v, negative_slope=0.2)
        conv = lambda f, s, p, name, bias=True: nn.Conv(
            f, (4, 4), strides=(s, s), padding=p, use_bias=bias,
            dtype=self.dtype, param_dtype=self.param_dtype, name=name)
        x = lrelu(conv(64, 2, 1, "l1", bias=False)(x))
        x = lrelu(_instance_norm(conv(128, 2, 1, "l2")(x)))
        x = lrelu(_instance_norm(conv(256, 2, 1, "l3")(x)))
        x = lrelu(_instance_norm(conv(512, 1, 2, "l4")(x)))
        return conv(64, 1, 2, "last", bias=False)(x)


def lsgan_d_loss(pred_real: jnp.ndarray, pred_fake: jnp.ndarray) -> jnp.ndarray:
    return 0.5 * (jnp.mean((pred_real - 1.0) ** 2) + jnp.mean(pred_fake**2))


def lsgan_g_loss(pred_fake: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((pred_fake - 1.0) ** 2)


def frames_to_images(video: jnp.ndarray) -> jnp.ndarray:
    """(B, T, H, W, C) → (B·T, H, W, C) for the per-image discriminator."""
    b, t, h, w, c = video.shape
    return video.reshape(b * t, h, w, c)


def rearrange_seq_extrap(seq: jnp.ndarray, context: jnp.ndarray) -> jnp.ndarray:
    """Sliding windows [context[i:], seq[:i+1]] channel-stacked
    (reference Vid-ODE/models/gan.py:93-128 get_real_fake_seqs).

    Window i keeps ALL (t_ctx − i) + (i + 1) = t_ctx + 1 frames — the
    reference sizes the sequence discriminator with ``seq_len += 1`` in
    extrapolation mode (gan.py:174), so windows are one frame LONGER
    than the prediction length, not truncated. Windows shorter than t
    (unequal mode with t_ctx + 1 < t) are zero-padded on the left,
    matching the reference's ``l < t`` branch.

    (B, T, H, W, C) × context (B, T_ctx, H, W, C)
        → (B·T, H, W, max(T_ctx+1, T)·C), frame-major channel packing.
    """
    b, t, h, w, c = seq.shape
    t_ctx = context.shape[1]
    out_len = max(t_ctx + 1, t)
    outs = []
    for i in range(t):
        window = jnp.concatenate([context[:, i:], seq[:, : i + 1]], axis=1)
        if window.shape[1] < out_len:
            pad = jnp.zeros((b, out_len - window.shape[1], h, w, c),
                            seq.dtype)
            window = jnp.concatenate([pad, window], axis=1)
        outs.append(window)
    stacked = jnp.concatenate(outs, axis=0)    # (B·T, out_len, H, W, C)
    return jnp.moveaxis(stacked, 1, -2).reshape(b * t, h, w, out_len * c)


def rearrange_seq_interp(seq: jnp.ndarray, context: jnp.ndarray) -> jnp.ndarray:
    """Swap a single frame of the real context with the candidate frame,
    one window per position (interpolation mode)."""
    b, t, h, w, c = seq.shape
    eye = jnp.eye(t, dtype=seq.dtype)
    outs = []
    for i in range(t):
        m = eye[i].reshape(1, t, 1, 1, 1)
        outs.append((1.0 - m) * context + m * seq)
    stacked = jnp.concatenate(outs, axis=0)
    return jnp.moveaxis(stacked, 1, -2).reshape(b * t, h, w, t * c)
