"""S2VAE / CS2VAE — slot-sequential VAE.

Capability parity with /root/reference/models/S2VAE.py:17-232: a shallow
Conv3D stem → C3D encoder → slot attention produces per-slot initial
latents z0_s → per-slot recurrent rollout to the prediction horizon
(GRU with zero inputs for 's2vae' / upsampled ConvGRU for 'cs2vae',
reference gru_rollout :97-115 and cgru_rollout :117-130) → per-slot
posterior (mu, logvar) heads → reparameterized samples decoded by one
shared CNN decoder over concatenated slots; ELBO loss = sum-reduced
reconstruction + KL against the slot prior (:204-220).

Behavioral notes:
  * the posterior std uses the reference's ``0.5 * exp(logvar)`` quirk
    (S2VAE.py:181 — not exp(0.5·logvar));
  * the reference's pre-decoder reshape interleaves the slot and time
    axes (S2VAE.py:190 flattens (b, S, t, f) into frames of a single
    slot across time); here the intended (b, t, S·f) layout is used;
  * ``prior='infer'`` is a TODO in the reference (:176-178); here it is
    completed with a GRU prior over the posterior (mu, std) sequence;
  * ``unmasked=False`` (slot-masked decoding) is a NotImplemented branch
    in the reference (:192); here it is completed with per-slot decoding
    and softmax alpha compositing (the standard slot-decoder design the
    reference's unstack_and_split supports).
"""

from __future__ import annotations

from typing import Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ode_rl_tpu.nn.c3d import C3DEncoder, SlotCNNDecoder
from ode_rl_tpu.nn.convgru import ConvGRUCell, convgru_freerun
from ode_rl_tpu.nn.s3vae_nets import _GRU
from ode_rl_tpu.nn.slot_attention import SlotAttentionAutoEncoder


class _GRUStackStep(nn.Module):
    """One time step of a multi-layer GRU free-run (zero inputs, each
    layer feeds the next — reference gru_rollout, S2VAE.py:97-115)."""

    f: int
    gru_layers: int
    dtype: jnp.dtype
    param_dtype: jnp.dtype

    @nn.compact
    def __call__(self, hs, _):
        inp = jnp.zeros_like(hs[0])
        new_hs = []
        for l in range(self.gru_layers):
            h_new, _ = nn.GRUCell(features=self.f, dtype=self.dtype,
                                  param_dtype=self.param_dtype,
                                  name=f"l{l}")(hs[l], inp)
            new_hs.append(h_new)
            inp = h_new
        return tuple(new_hs), new_hs[-1]


class _SlotGRURollout(nn.Module):
    """Rollout + (mu, logvar) heads for ONE slot; the slot axis is mapped
    over this module with nn.vmap (per-slot parameters, single trace)."""

    f: int
    gru_layers: int
    out_seq: int
    dtype: jnp.dtype
    param_dtype: jnp.dtype

    @nn.compact
    def __call__(self, z0):                      # (B, f)
        hs0 = tuple([z0] * self.gru_layers)
        scan = nn.scan(
            _GRUStackStep,
            variable_broadcast="params",
            split_rngs={"params": False},
            out_axes=1,
            length=self.out_seq,
        )
        _, roll = scan(f=self.f, gru_layers=self.gru_layers,
                       dtype=self.dtype, param_dtype=self.param_dtype,
                       name="trans")(hs0, None)  # (B, T, f)
        mu = nn.Dense(self.f, dtype=self.dtype,
                      param_dtype=self.param_dtype, name="mu")(roll)
        lv = nn.Dense(self.f, dtype=self.dtype,
                      param_dtype=self.param_dtype, name="logvar")(roll)
        return roll, mu, lv


class _SlotCGRURollout(nn.Module):
    """CS2VAE variant: 1×1→4×4 up-projection, ConvGRU free-run, conv
    heads (reference cgru_rollout, S2VAE.py:117-130)."""

    f: int
    out_seq: int
    dtype: jnp.dtype
    param_dtype: jnp.dtype

    @nn.compact
    def __call__(self, z0):                      # (B, f)
        b = z0.shape[0]
        up = nn.ConvTranspose(self.f, (4, 4), padding="VALID",
                              dtype=self.dtype,
                              param_dtype=self.param_dtype,
                              name="up")(z0.reshape(b, 1, 1, self.f))
        cell = ConvGRUCell(hidden_dim=self.f, dtype=self.dtype,
                           param_dtype=self.param_dtype, name="trans")
        roll, _ = convgru_freerun(cell, up, self.out_seq)  # (B,T,4,4,f)
        conv = lambda name: nn.Conv(
            self.f, (3, 3), padding=1, dtype=self.dtype,
            param_dtype=self.param_dtype, name=name)
        return roll, conv("mu")(roll), conv("logvar")(roll)


def s2vae_vae_loss(x_hat, target, post_mu, post_std, prior_mu, prior_std):
    """The S2VAE ELBO terms exactly as the reference computes them
    (models/S2VAE.py:204-220 get_vae_loss): sum-reduced MSE over the
    whole batch divided by B·T, plus the closed-form Gaussian
    KL(post ‖ prior) expressed through log-variances, also sum-reduced
    and divided by B·T. Returns (recon, kl); pinned against the
    reference source in tests/test_reference_parity.py."""
    b, t = x_hat.shape[:2]
    recon = jnp.sum(jnp.square(x_hat - target)) / (b * t)
    pri_lv, post_lv = 2 * jnp.log(prior_std), 2 * jnp.log(post_std)
    kl = 0.5 * jnp.sum(
        pri_lv - post_lv
        + (jnp.exp(post_lv) + (post_mu - prior_mu) ** 2) / jnp.exp(pri_lv)
        - 1) / (b * t)
    return recon, kl


class S2VAEModel(nn.Module):
    in_channels: int = 1
    d_zf: int = 128
    num_slots: int = 3
    slot_size: int = 128
    num_iterations: int = 3
    gru_layers: int = 2
    transition: str = "gru"          # gru (S2VAE) | cgru (CS2VAE)
    conv_mode: bool = False          # True for CS2VAE
    prior: str = "standard"          # standard | infer
    unmasked: bool = True
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def predict(self, batch: Dict, train: bool = True
                ) -> Tuple[jnp.ndarray, Dict]:
        inputs = batch["observed_data"].astype(self.dtype) + 0.5
        b, t_in, h, w, c = inputs.shape
        out_seq = batch["tp_to_predict"].shape[0]
        s = self.num_slots
        f = self.slot_size

        # 1. Conv3D stem (in → 32 ch, spatial /2) + C3D encoder.
        stem = nn.Conv(32, (3, 3, 3), strides=(1, 2, 2),
                       padding=[(1, 1), (1, 1), (1, 1)], dtype=self.dtype,
                       param_dtype=self.param_dtype, name="c3d_stem")
        x = jax.nn.leaky_relu(stem(inputs), negative_slope=0.2)
        mode = "cgru" if self.transition == "cgru" else "default"
        z_enc = C3DEncoder(out_channels=self.d_zf, mode=mode,
                           dtype=self.dtype, param_dtype=self.param_dtype,
                           name="z_net")(x)   # (B, T', h', w', d_zf)
        bt, tp, hp, wp, _ = z_enc.shape

        # 2. Slot attention → per-slot z0. The set axis is the encoder's
        # remaining time steps ('gru') or all spatio-temporal positions
        # ('cgru' — the reference's conv path is inconsistent; see
        # module docstring).
        if self.transition == "gru":
            set_in = z_enc.reshape(b, tp * hp * wp, self.d_zf) \
                if (hp * wp) > 1 else z_enc.reshape(b, tp, self.d_zf)
        else:
            set_in = z_enc.reshape(b, tp * hp * wp, self.d_zf)
        slot_z0 = SlotAttentionAutoEncoder(
            d_features=self.d_zf, num_slots=s,
            num_iterations=self.num_iterations, slot_size=f,
            dtype=self.dtype, param_dtype=self.param_dtype,
            name="slot_z")(set_in)             # (B, S, f)

        # 3. Per-slot rollout to out_seq with per-slot heads. One module
        # traced ONCE: nn.vmap maps the slot axis with per-slot parameters
        # (variable_axes={'params': 0}) and nn.scan handles the time axis
        # — the reference's per-slot Python loops (S2VAE.py:97-130)
        # re-trace the whole rollout per slot, which on TPU multiplied
        # compile time by the slot count (15-minute compiles).
        if self.transition == "gru":
            roller_cls, kwargs = _SlotGRURollout, {
                "f": f, "gru_layers": self.gru_layers, "out_seq": out_seq}
        else:
            roller_cls, kwargs = _SlotCGRURollout, {"f": f,
                                                    "out_seq": out_seq}
        SlotRoller = nn.vmap(
            roller_cls,
            in_axes=1, out_axes=1,
            variable_axes={"params": 0},
            split_rngs={"params": True},
        )
        _, post_mu, post_lv = SlotRoller(
            dtype=self.dtype, param_dtype=self.param_dtype,
            name="slot_rollout", **kwargs)(slot_z0)   # (B, S, T, …, f)
        post_std = 0.5 * jnp.exp(post_lv)      # reference quirk (:181)

        # Prior: N(0,1), or inferred by a GRU over the posterior stats.
        if self.prior == "infer":
            seq = jnp.concatenate([post_mu, post_std], axis=-1)
            seq = seq.reshape(b * s, out_seq, -1)
            outs, _ = _GRU(2 * f, dtype=self.dtype,
                           param_dtype=self.param_dtype,
                           name="prior_gru")(seq)
            pri = nn.Dense(post_mu.reshape(b * s, out_seq, -1).shape[-1] * 2,
                           dtype=self.dtype, param_dtype=self.param_dtype,
                           name="prior_head")(outs)
            pri_mu, pri_raw = jnp.split(pri, 2, axis=-1)
            prior_mu = pri_mu.reshape(post_mu.shape)
            prior_std = jax.nn.softplus(pri_raw).reshape(post_std.shape) + 1e-4
        else:
            prior_mu = jnp.zeros_like(post_mu)
            prior_std = jnp.ones_like(post_std)

        zs = post_mu + post_std * jax.random.normal(
            self.make_rng("sample"), post_mu.shape, self.dtype)

        # 4. Decode: per-frame concat of slots (intended (b, t, S·f)).
        variant = "cs2vae" if self.conv_mode else "s2vae"
        if self.transition == "gru":
            dec_base = jnp.swapaxes(zs, 1, 2).reshape(b * out_seq, 1, 1, s * f)
        else:
            dec_base = jnp.swapaxes(zs, 1, 2)  # (B, T, S, 4, 4, f)
            dec_base = jnp.moveaxis(dec_base, 2, -2).reshape(
                b * out_seq, 4, 4, s * f)
        if self.unmasked:
            dec = SlotCNNDecoder(out_channels=self.in_channels,
                                 variant=variant, unmasked=True,
                                 dtype=self.dtype,
                                 param_dtype=self.param_dtype,
                                 name="cnn_decoder")
            x_hat = dec(dec_base, train=train)
            x_hat = x_hat.reshape(b, out_seq, h, w, self.in_channels)
        else:
            # Completed slot-masked decoding: decode each slot with an
            # alpha channel, softmax-composite over slots.
            dec = SlotCNNDecoder(out_channels=self.in_channels,
                                 variant=variant, unmasked=False,
                                 dtype=self.dtype,
                                 param_dtype=self.param_dtype,
                                 name="cnn_decoder")
            if self.transition == "gru":
                per_slot = zs.reshape(b * s * out_seq, 1, 1, f)
            else:
                per_slot = zs.reshape((b * s * out_seq,) + zs.shape[3:])
            out = dec(per_slot, train=train)
            out = out.reshape(b, s, out_seq, h, w, self.in_channels + 1)
            recons, masks = out[..., :-1], out[..., -1:]
            masks = jax.nn.softmax(masks, axis=1)
            x_hat = jnp.sum(recons * masks, axis=1)

        aux = {"post_mu": post_mu, "post_std": post_std,
               "prior_mu": prior_mu, "prior_std": prior_std}
        return x_hat.astype(jnp.float32), aux

    # ------------------------------------------------------------------
    def loss(self, batch: Dict, train: bool = True):
        x_hat, aux = self.predict(batch, train=train)
        target = batch["data_to_predict"].astype(jnp.float32) + 0.5
        recon, kl = s2vae_vae_loss(
            x_hat, target,
            aux["post_mu"].astype(jnp.float32),
            aux["post_std"].astype(jnp.float32),
            aux["prior_mu"].astype(jnp.float32),
            aux["prior_std"].astype(jnp.float32))
        loss = recon + kl
        metrics = {"loss": loss, "vae_loss": loss, "recon_loss": recon,
                   "kl_loss": kl}
        return loss, (metrics, x_hat)
