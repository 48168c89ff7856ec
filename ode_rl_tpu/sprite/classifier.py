"""Sprites judge classifier.

Capability parity with
/root/reference/code_sprite/models/DS_VAE.py:520-565
(Supervised_Classifier_Sprite) and the evaluation scripts
(video_classifier_Sprite_all.py, test_DS_VAE_Sprite_Cls_disagree.py):
an LSTM over the motion latents z_1..z_T predicts the action class and
an MLP on the content latent f predicts the attribute class — the judge
used to score disentanglement (action should be predictable from z only,
attributes from f only).
"""

from __future__ import annotations

from typing import Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ode_rl_tpu.sprite.dsvae import _LSTM


class SpriteJudge(nn.Module):
    n_actions: int = 4
    n_attrs: int = 6
    hidden: int = 128
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z_seq: jnp.ndarray, f: jnp.ndarray
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """z_seq: (B, T, z_dim); f: (B, f_dim) → (action_logits,
        attr_logits)."""
        outs = _LSTM(self.hidden, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="z_lstm")(z_seq)
        action_logits = nn.Dense(self.n_actions, dtype=self.dtype,
                                 param_dtype=self.param_dtype,
                                 name="action_head")(outs[:, -1])
        h = jax.nn.relu(nn.Dense(self.hidden, dtype=self.dtype,
                                 param_dtype=self.param_dtype,
                                 name="attr_h")(f))
        attr_logits = nn.Dense(self.n_attrs, dtype=self.dtype,
                               param_dtype=self.param_dtype,
                               name="attr_head")(h)
        return action_logits, attr_logits

    def loss(self, z_seq, f, actions, attrs) -> Tuple[jnp.ndarray, Dict]:
        a_log, at_log = self(z_seq, f)
        a_oh = jax.nn.one_hot(actions, self.n_actions)
        at_oh = jax.nn.one_hot(attrs, self.n_attrs)
        a_loss = -jnp.mean(jnp.sum(
            a_oh * jax.nn.log_softmax(a_log.astype(jnp.float32)), -1))
        at_loss = -jnp.mean(jnp.sum(
            at_oh * jax.nn.log_softmax(at_log.astype(jnp.float32)), -1))
        acc = lambda logit, lab: jnp.mean(
            (jnp.argmax(logit, -1) == lab).astype(jnp.float32))
        metrics = {"action_loss": a_loss, "attr_loss": at_loss,
                   "action_acc": acc(a_log, actions),
                   "attr_acc": acc(at_log, attrs)}
        return a_loss + at_loss, metrics
