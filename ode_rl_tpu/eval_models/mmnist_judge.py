"""Judge classifier for Moving-MNIST disentanglement probes.

Port of the sprite disagreement protocol (reference
code_sprite/video_classifier_Sprite_all.py + the disagreement metrics in
test_DS_VAE_Sprite_Cls_disagree.py) to the flagship S3VAE's dataset: a
small supervised classifier scores latent-swap decodes on
  * content — which sprite identity is drawn (restricted bank, the
    generator's content factor), judged position-invariantly via global
    average pooling;
  * motion — where the digit is at the start and end of the clip
    (canvas-quadrant labels derived from the generator's trajectory, the
    motion factor that z_t should carry).

Disentanglement shows up as an asymmetry: decoding (z_f of A, z_t of B)
should be judged as A's sprite moving along B's trajectory.
"""

from __future__ import annotations

from typing import Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ode_rl_tpu.data.sprites import DIGIT_SIZE


def quadrant_labels(positions: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(B, D, T, 2) int32 top-left positions → (start_quad, end_quad)
    labels (B,) for the FIRST digit: canvas quadrant of the digit center
    at the first and last frame (0..3 = 2·(y≥32) + (x≥32))."""
    center = positions[:, 0].astype(jnp.float32) + DIGIT_SIZE / 2.0
    quad = lambda p: (2 * (p[:, 0] >= 32).astype(jnp.int32)
                      + (p[:, 1] >= 32).astype(jnp.int32))
    return quad(center[:, 0]), quad(center[:, -1])


class MMNISTJudge(nn.Module):
    n_sprites: int = 16
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, video: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        """video (B, T, 64, 64, 1) in [0, 1] → logits dict."""
        b, t = video.shape[:2]
        x = video.reshape((b * t,) + video.shape[2:]).astype(self.dtype)
        conv = lambda f, s, name: nn.Conv(f, (3, 3), strides=(s, s),
                                          padding=1, dtype=self.dtype,
                                          name=name)
        h = jax.nn.relu(conv(32, 2, "c0")(x))
        h = jax.nn.relu(conv(64, 2, "c1")(h))
        h = jax.nn.relu(conv(64, 2, "c2")(h))          # (B·T, 8, 8, 64)
        h = h.reshape(b, t, 8, 8, 64)

        # Content: position-invariant — global average pool, mean over T.
        gap = jnp.mean(h, axis=(2, 3)).mean(axis=1)
        sprite = nn.Dense(self.n_sprites, dtype=self.dtype,
                          name="head_sprite")(
            jax.nn.relu(nn.Dense(128, dtype=self.dtype, name="fc_c")(gap)))

        # Motion: position-sensitive — flatten the first/last frame maps.
        flat = lambda fm: fm.reshape(b, -1)
        fc_m = nn.Dense(128, dtype=self.dtype, name="fc_m")
        head_q = lambda name: nn.Dense(4, dtype=self.dtype, name=name)
        q0 = head_q("head_q0")(jax.nn.relu(fc_m(flat(h[:, 0]))))
        q1 = head_q("head_q1")(jax.nn.relu(fc_m(flat(h[:, -1]))))
        return {"sprite": sprite, "q0": q0, "q1": q1}

    def loss(self, video, sprite_lbl, q0_lbl, q1_lbl):
        logits = self(video)
        xe = lambda lg, y: jnp.mean(
            -jax.nn.log_softmax(lg.astype(jnp.float32))[
                jnp.arange(y.shape[0]), y])
        loss = (xe(logits["sprite"], sprite_lbl) + xe(logits["q0"], q0_lbl)
                + xe(logits["q1"], q1_lbl))
        acc = lambda lg, y: jnp.mean(
            (jnp.argmax(lg, -1) == y).astype(jnp.float32))
        metrics = {"loss": loss,
                   "acc_sprite": acc(logits["sprite"], sprite_lbl),
                   "acc_q0": acc(logits["q0"], q0_lbl),
                   "acc_q1": acc(logits["q1"], q1_lbl)}
        return loss, metrics
