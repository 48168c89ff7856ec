"""DS2VAE — disentangled slot-sequential VAE (completed).

The reference left this model as a skeleton: its forward stops after the
RIM rollout and ``get_loss`` is ``pass``
(/root/reference/models/DS2VAE.py:100-109 — steps 7-9 are TODO comments).
This implementation completes the model exactly along the reference's
own numbered plan (:62-104):
  1. Conv3D stem;
  2. static path: C3D encoder → per-time features;
  3. slot attention → per-slot static latents z_f with linear mu/logvar
     heads (std via the family's ``0.5·exp(logvar)`` convention);
  4. z_f slot prior = N(0, 1);
  5-6. dynamic path: a second C3D encoder → z0 sequence → RIM rollout
     over the prediction horizon;
  7. (completed TODO) a GRU prior over the posterior (mu, std) sequence;
  8. (completed TODO) decode concat(z_f slots, z_t) per step with the
     shared slot CNN decoder;
  9. (completed TODO) loss = sum-reduced MSE + static-slot KL +
     dynamic KL — the structure named in the reference's comment.
"""

from __future__ import annotations

from typing import Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ode_rl_tpu.nn.c3d import C3DEncoder, SlotCNNDecoder
from ode_rl_tpu.nn.rims import RIM
from ode_rl_tpu.nn.s3vae_nets import _GRU
from ode_rl_tpu.nn.slot_attention import SlotAttentionAutoEncoder


class DS2VAEModel(nn.Module):
    in_channels: int = 1
    d_zf: int = 128
    n_hid: int = 300
    num_slots: int = 3
    slot_size: int = 128
    num_iterations: int = 3
    num_blocks: int = 3
    topk: int = 3
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def predict(self, batch: Dict, train: bool = True
                ) -> Tuple[jnp.ndarray, Dict]:
        inputs = batch["observed_data"].astype(self.dtype) + 0.5
        b, t_in, h, w, c = inputs.shape
        out_seq = batch["tp_to_predict"].shape[0]
        s, f = self.num_slots, self.slot_size

        # 1. Conv3D stem.
        stem = nn.Conv(32, (3, 3, 3), strides=(1, 2, 2),
                       padding=[(1, 1), (1, 1), (1, 1)], dtype=self.dtype,
                       param_dtype=self.param_dtype, name="c3d_stem")
        x = jax.nn.leaky_relu(stem(inputs), negative_slope=0.2)

        # 2-3. Static: C3D features → slot attention → per-slot (mu, lv).
        zf_enc = C3DEncoder(out_channels=self.d_zf, mode="default",
                            dtype=self.dtype, param_dtype=self.param_dtype,
                            name="zf_net")(x)
        bt, tp, hp, wp, _ = zf_enc.shape
        zf_set = zf_enc.reshape(b, tp * hp * wp, self.d_zf)
        slot_zf = SlotAttentionAutoEncoder(
            d_features=self.d_zf, num_slots=s,
            num_iterations=self.num_iterations, slot_size=f,
            dtype=self.dtype, param_dtype=self.param_dtype,
            name="slot_zf")(zf_set)                      # (B, S, f)
        zf_mu = nn.Dense(f, dtype=self.dtype, param_dtype=self.param_dtype,
                         name="slot_zf_mu_net")(slot_zf)
        zf_lv = nn.Dense(f, dtype=self.dtype, param_dtype=self.param_dtype,
                         name="slot_zf_logvar_net")(slot_zf)
        zf_std = 0.5 * jnp.exp(zf_lv)                    # family quirk

        # 5-6. Dynamic: second C3D encoder → z0 sequence → RIM rollout.
        zt_enc = C3DEncoder(out_channels=self.n_hid, mode="default",
                            dtype=self.dtype, param_dtype=self.param_dtype,
                            name="zt_net")(x)
        z0_seq = zt_enc.mean(axis=(2, 3))                # (B, T', n_hid)
        # Extend/trim to the prediction horizon (RIM inputs per step).
        t_enc = z0_seq.shape[1]
        if t_enc >= out_seq:
            rim_in = z0_seq[:, :out_seq]
        else:
            pad = jnp.repeat(z0_seq[:, -1:], out_seq - t_enc, axis=1)
            rim_in = jnp.concatenate([z0_seq, pad], axis=1)
        rim = RIM(ninp=self.n_hid, n_hid=[self.n_hid],
                  num_blocks=[self.num_blocks], topk=[self.topk],
                  dtype=self.dtype, param_dtype=self.param_dtype,
                  name="dynamic_net")
        zt_hidden, _ = rim(rim_in, train=train)          # (B, T, n_hid)
        zt_mu = nn.Dense(f, dtype=self.dtype, param_dtype=self.param_dtype,
                         name="zt_mu_net")(zt_hidden)
        zt_lv = nn.Dense(f, dtype=self.dtype, param_dtype=self.param_dtype,
                         name="zt_logvar_net")(zt_hidden)
        zt_std = 0.5 * jnp.exp(zt_lv)

        # 7. GRU prior over the posterior (mu, std) sequence.
        prior_in = jnp.concatenate([zt_mu, zt_std], axis=-1)
        outs, _ = _GRU(2 * f, dtype=self.dtype, param_dtype=self.param_dtype,
                       name="prior_gru")(prior_in)
        pri = nn.Dense(2 * f, dtype=self.dtype, param_dtype=self.param_dtype,
                       name="prior_head")(outs)
        pri_mu, pri_raw = jnp.split(pri, 2, axis=-1)
        pri_std = jax.nn.softplus(pri_raw) + 1e-4

        # 8. Sample and decode concat(z_f slots, z_t) per step.
        k1, k2 = jax.random.split(self.make_rng("sample"))
        zf = zf_mu + zf_std * jax.random.normal(k1, zf_mu.shape, self.dtype)
        zt = zt_mu + zt_std * jax.random.normal(k2, zt_mu.shape, self.dtype)
        zf_flat = zf.reshape(b, 1, s * f)
        zf_rep = jnp.broadcast_to(zf_flat, (b, out_seq, s * f))
        dec_in = jnp.concatenate([zf_rep, zt], axis=-1)
        dec_in = dec_in.reshape(b * out_seq, 1, 1, -1)
        x_hat = SlotCNNDecoder(out_channels=self.in_channels,
                               variant="s2vae", dtype=self.dtype,
                               param_dtype=self.param_dtype,
                               name="cnn_decoder")(dec_in, train=train)
        x_hat = x_hat.reshape(b, out_seq, h, w, self.in_channels)

        aux = {"zf_mu": zf_mu, "zf_std": zf_std,
               "zt_mu": zt_mu, "zt_std": zt_std,
               "prior_mu": pri_mu, "prior_std": pri_std}
        return x_hat.astype(jnp.float32), aux

    # ------------------------------------------------------------------
    def loss(self, batch: Dict, train: bool = True):
        x_hat, aux = self.predict(batch, train=train)
        target = batch["data_to_predict"].astype(jnp.float32) + 0.5
        b, t = x_hat.shape[:2]

        recon = jnp.sum(jnp.square(x_hat - target)) / (b * t)

        zf_mu = aux["zf_mu"].astype(jnp.float32)
        zf_std = aux["zf_std"].astype(jnp.float32)
        zf_lv = 2 * jnp.log(zf_std)
        kl_zf = -0.5 * jnp.sum(
            1 + zf_lv - zf_mu**2 - jnp.exp(zf_lv)) / (b * t)

        post_mu = aux["zt_mu"].astype(jnp.float32)
        post_std = aux["zt_std"].astype(jnp.float32)
        pri_mu = aux["prior_mu"].astype(jnp.float32)
        pri_std = aux["prior_std"].astype(jnp.float32)
        pri_lv, post_lv = 2 * jnp.log(pri_std), 2 * jnp.log(post_std)
        kl_zt = 0.5 * jnp.sum(
            pri_lv - post_lv
            + (jnp.exp(post_lv) + (post_mu - pri_mu) ** 2) / jnp.exp(pri_lv)
            - 1) / (b * t)

        loss = recon + kl_zf + kl_zt
        metrics = {"loss": loss, "recon_loss": recon, "kl_zf": kl_zf,
                   "kl_zt": kl_zt}
        return loss, (metrics, x_hat)
