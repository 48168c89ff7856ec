"""Slot Attention (object-centric grouping).

Capability parity with the reference's SlotAttention module
(/root/reference/modules/SlotAttention.py:53-147): iterative attention
with k/q/v linear maps (q scaled by slot_size^-0.5, softmax over slots,
epsilon-renormalized weighted mean), per-slot GRUCell update, residual
MLP; slots initialized from a shared learned Gaussian; plus the
autoencoder wrapper's LayerNorm+MLP preprocessing and spatial broadcast
(/root/reference/modules/SlotAttention.py:149-204,22-28).

Deliberate deviations:
  * the reference creates ``slots_mu``/``slots_log_sigma`` via nn.init on
    raw tensors that are never registered as Parameters (noted in SURVEY
    §2.3) — effectively frozen random init; here they are real learnable
    params (the published Slot Attention design);
  * the slot init noise comes from an explicit PRNG stream ('sample').

TPU-first: the per-slot Python GRU loop (reference :137-142) is a single
batched GRUCell application over (B·S, D) — slots fold into the batch
axis; the iteration loop is short and static so it stays unrolled.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


class SlotAttention(nn.Module):
    num_slots: int = 3
    num_iterations: int = 3
    slot_size: int = 128
    mlp_hidden_size: int = 128
    epsilon: float = 1e-8
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 init_noise: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """x: (B, N_inputs, D_features) → slots (B, S, slot_size).

        ``init_noise`` (B, S, slot_size) overrides the internal 'sample'
        RNG draw for the slot initialization — callers that process many
        frames of the same video share one draw across frames so slot
        identities stay temporally bound (models/vidode.py slot path)."""
        b = x.shape[0]
        d = self.slot_size
        dense = lambda feats, name, bias=True: nn.Dense(
            feats, use_bias=bias, dtype=self.dtype,
            param_dtype=self.param_dtype, name=name)

        x = nn.LayerNorm(dtype=self.dtype, name="norm_inputs")(x)
        k = dense(d, "project_k", bias=False)(x)   # (B, N, D)
        v = dense(d, "project_v", bias=False)(x)   # (B, N, D)

        slots_mu = self.param(
            "slots_mu", nn.initializers.xavier_uniform(), (1, 1, d),
            self.param_dtype)
        slots_log_sigma = self.param(
            "slots_log_sigma", nn.initializers.xavier_uniform(), (1, 1, d),
            self.param_dtype)
        noise = (init_noise.astype(self.dtype) if init_noise is not None
                 else jax.random.normal(
                     self.make_rng("sample"), (b, self.num_slots, d),
                     self.dtype))
        slots = slots_mu + jnp.exp(slots_log_sigma) * noise

        gru = nn.GRUCell(features=d, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="gru")
        norm_slots = nn.LayerNorm(dtype=self.dtype, name="norm_slots")
        norm_mlp = nn.LayerNorm(dtype=self.dtype, name="norm_mlp")
        project_q = dense(d, "project_q", bias=False)
        mlp_0 = dense(self.mlp_hidden_size, "mlp_0")
        mlp_1 = dense(d, "mlp_1")

        for _ in range(self.num_iterations):
            slots_prev = slots
            slots_n = norm_slots(slots)
            q = project_q(slots_n) * d ** -0.5
            attn_logits = jnp.einsum("bnd,bsd->bns", k, q)
            attn = jax.nn.softmax(attn_logits, axis=-1)  # over slots
            attn = attn + self.epsilon
            attn = attn / jnp.sum(attn, axis=-2, keepdims=True)
            updates = jnp.einsum("bns,bnd->bsd", attn, v)

            # Batched GRU update: slots fold into the batch axis.
            flat_prev = slots_prev.reshape(b * self.num_slots, d)
            flat_upd = updates.reshape(b * self.num_slots, d)
            flat_new, _ = gru(flat_prev, flat_upd)
            slots = flat_new.reshape(b, self.num_slots, d)

            mlp_in = norm_mlp(slots)
            slots = slots + mlp_1(jax.nn.relu(mlp_0(mlp_in)))

        return slots


def spatial_broadcast(slots: jnp.ndarray, resolution) -> jnp.ndarray:
    """(B, S, D) → (B·S, H, W, D): broadcast each slot over a grid
    (reference spatial_broadcast, SlotAttention.py:22-28)."""
    b, s, d = slots.shape
    flat = slots.reshape(b * s, 1, 1, d)
    return jnp.broadcast_to(flat, (b * s, resolution[0], resolution[1], d))


class SlotAttentionAutoEncoder(nn.Module):
    """LayerNorm+MLP preprocessing → SlotAttention (→ optional broadcast).

    Parity with the reference wrapper (SlotAttention.py:149-204): the
    'default' path treats the feature vector as a single set element; the
    conv path flattens the spatial grid into the set axis.
    """

    d_features: int
    num_slots: int = 3
    num_iterations: int = 3
    slot_size: int = 128
    conv_input: bool = False      # x is (B, H, W, C) → flatten HW into set
    broadcast_hw: Optional[tuple] = None  # e.g. (8, 8) for cgru_sa decode
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        dense = lambda feats, name: nn.Dense(
            feats, dtype=self.dtype, param_dtype=self.param_dtype, name=name)
        if self.conv_input:
            b, h, w, c = x.shape
            x = x.reshape(b, h * w, c)
        elif x.ndim == 2:
            x = x[:, None, :]  # single set element
        x = nn.LayerNorm(dtype=self.dtype, name="pre_norm")(x)
        x = dense(self.d_features, "pre_mlp_0")(x)
        x = jax.nn.relu(x)
        x = dense(self.d_features, "pre_mlp_1")(x)
        slots = SlotAttention(
            num_slots=self.num_slots, num_iterations=self.num_iterations,
            slot_size=self.slot_size, dtype=self.dtype,
            param_dtype=self.param_dtype, name="slot_attention")(x)
        if self.broadcast_hw is not None:
            return spatial_broadcast(slots, self.broadcast_hw)
        return slots


class SoftPositionEmbed(nn.Module):
    """Learned linear projection of a 4-channel [y, x, 1−y, 1−x] grid
    added to NHWC features (reference SoftPositionEmbed,
    modules/SlotAttention.py:30-51 / Vid-ODE/models/base_conv_gru.py:
    247-262 — the slot-attention encoder's step-2 positional code)."""

    hidden_size: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h, w = x.shape[-3], x.shape[-2]
        gy, gx = jnp.meshgrid(jnp.linspace(0.0, 1.0, h),
                              jnp.linspace(0.0, 1.0, w), indexing="ij")
        grid = jnp.stack([gy, gx, 1.0 - gy, 1.0 - gx], axis=-1)  # (H, W, 4)
        emb = nn.Dense(self.hidden_size, dtype=self.dtype,
                       param_dtype=self.param_dtype,
                       name="dense")(grid.astype(self.dtype))
        return x + emb
