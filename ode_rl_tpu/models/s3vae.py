"""S3VAE — disentangled sequential VAE.

Capability parity with /root/reference/models/S3VAE.py:17-467: a static
(time-invariant) latent z_f and dynamic latents z_1..z_T with a learned
prior, trained with the 4-term loss
``l0·VAE + l1·SCC + l2·DFP + l3·MI``:
  * VAE — sum-reduced reconstruction + KL(z_f ‖ N(0,1)) + KL(q(z_t) ‖
    learned prior) (reference :337-363);
  * SCC — triplet margin loss pulling z_f of a time-shuffled version of
    the same video (positive) against z_f of another video (negative)
    (:365-379; positives/negatives sampled without reparameterization,
    matching torch ``.sample()``);
  * DFP — BCE of a motion-grid classifier on z_t against flow labels
    (:381-389; sigmoid applied once — the reference applies it twice);
  * MI — minibatch-weighted logsumexp estimate of I(z_f; z_t) (:391-449).

Encoder variants: 'default' (vector latents via 64×64→1×1 CNN + GRU,
optional RIM dynamics and slot attention on z_f), 'cgru' (spatial
latents via ConvGRU), 'odecgru' (ODE-ConvGRU z0 + Neural-ODE dynamic
rollout — the reference's branch is dead code due to an undefined
attribute; this is the intended semantics). 'cgru_sa' (slot attention on
spatial static latents) follows the same path as 'cgru' with slot
attention applied to the static maps.

Behavioral quirk replicated: the reference chains softplus-std through
``exp(0.5·x)`` for the vector heads (S3VAE.py:139 applied to GRUEncoder's
softplus output); we reproduce that exact composition.

TPU-first: all stochasticity threads through the 'sample' PRNG stream;
the whole loss (including the O(B²) MI estimate) is one jitted program;
recurrences are lax.scan.
"""

from __future__ import annotations

from typing import Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ode_rl_tpu.nn.s3vae_nets import (
    DFP, ConvGRUEncoderS3, FrameDecoder, FrameEncoder, GRUEncoder)
from ode_rl_tpu.nn.slot_attention import SlotAttentionAutoEncoder


def _normal_logprob(mu, std, x):
    var = std * std
    return -0.5 * (jnp.log(2.0 * jnp.pi * var) + (x - mu) ** 2 / var)


# --- pure loss-term functions (parity-tested against the reference's own
# --- source in tests/test_reference_parity.py) ----------------------------

def scc_triplet_loss(anchor, pos, neg, margin: float) -> jnp.ndarray:
    """SCC triplet with torch.nn.TripletMarginLoss semantics (the
    reference's, S3VAE.py:51,365-379): pairwise L2 along torch's LAST
    tensor axis with the +1e-6 eps added to the difference, hinge with
    the margin, mean over every remaining dim.

    For torch NCHW conv features the last axis is W; in our NHWC layout
    that is axis -2 (so ndim ≥ 4 → -2). Note this is row-wise distance,
    NOT a global per-sample norm — torch's pairwise_distance reduces only
    the final axis, and the reference feeds it 4D/5D conv features."""
    axis = -2 if anchor.ndim >= 4 else -1
    dist = lambda a, b: jnp.sqrt(
        jnp.sum(jnp.square(a - b + 1e-6), axis=axis))
    d_pos = dist(anchor, pos)
    d_neg = dist(anchor, neg)
    return jnp.mean(jnp.maximum(d_pos - d_neg + margin, 0.0))


def dfp_bce_loss(logits, labels) -> jnp.ndarray:
    """DFP motion-grid BCE (reference S3VAE.py:381-389:
    F.binary_cross_entropy(sigmoid(logits), labels))."""
    p = jax.nn.sigmoid(logits)
    return -jnp.mean(labels * jnp.log(p + 1e-7)
                     + (1 - labels) * jnp.log(1 - p + 1e-7))


def mi_estimate(mu_t, std_t, zt_s, mu_f, std_f, zf_s,
                log_nm) -> jnp.ndarray:
    """Minibatch-weighted logsumexp estimate of I(z_f; z_t) (reference
    S3VAE.py:391-449). Inputs are time-first dynamic stats (T, B, …),
    static stats (B, …), and the SAMPLES to evaluate (so tests can drive
    it with controlled samples); log_nm = log(N·M)."""
    log_q_t = _normal_logprob(mu_t[:, None], std_t[:, None], zt_s[:, :, None])
    log_q_t = jnp.sum(log_q_t, axis=tuple(range(3, log_q_t.ndim)))  # (T,B,B)

    log_q_f = _normal_logprob(mu_f[None], std_f[None], zf_s[:, None])
    log_q_f = jnp.sum(log_q_f, axis=tuple(range(2, log_q_f.ndim)))  # (B,B)
    log_q_f = jnp.broadcast_to(log_q_f[None], log_q_t.shape)

    h_t = -jax.nn.logsumexp(log_q_t - log_nm, axis=2)    # (T, B)
    h_f = -jax.nn.logsumexp(log_q_f - log_nm, axis=2)
    h_ft = -jax.nn.logsumexp(log_q_t + log_q_f - log_nm, axis=2)
    return jnp.mean(jax.nn.relu(-h_ft + h_f + h_t))


class S3VAEModel(nn.Module):
    in_channels: int = 1
    d_zf: int = 256
    d_zt: int = 32
    encoder: str = "default"
    n_hid: int = 512
    encoder_out_dims: int = 128
    k_stat: int = -1
    l0: float = 10.0
    l1: float = 1000.0
    l2: float = 100.0
    l3: float = 1.0
    margin: float = 1.0
    slot_att: bool = False
    num_slots: int = 3
    slot_size: int = 128
    num_iterations: int = 3
    rim: bool = False
    unit_per_rim: int = 100
    rim_num_blocks: int = 4     # encoder='cgru_rim': conv-RIM blocks
    rim_topk: int = 3
    flow_grid: int = 3
    extrapolate: bool = False
    data_points: int = 10000
    train_test_split: float = 0.8
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def predict(self, batch: Dict, train: bool = True, swap: bool = False
                ) -> Tuple[jnp.ndarray, Dict]:
        inputs = batch["observed_data"].astype(self.dtype) + 0.5
        b, t_in, h, w, c = inputs.shape
        out_seq = t_in if train else t_in + batch["tp_to_predict"].shape[0]
        vec = self.encoder == "default"
        num_rims = (self.n_hid // self.unit_per_rim) if self.rim else 1

        # ---- submodules (instantiated once, used repeatedly) ----------
        frame_enc = FrameEncoder(
            encoder_type=self.encoder, out_dims=self.encoder_out_dims,
            dtype=self.dtype, param_dtype=self.param_dtype,
            name="conv_encoder")
        if vec:
            static_head = GRUEncoder(
                hidden=self.n_hid, z_size=self.d_zf, head_type="static",
                dtype=self.dtype, param_dtype=self.param_dtype,
                name="static_rnn")
            dynamic_head = GRUEncoder(
                hidden=self.n_hid, z_size=self.d_zt, head_type="dynamic",
                rim=self.rim, num_rims=num_rims, dtype=self.dtype,
                param_dtype=self.param_dtype, name="dynamic_rnn")
            prior_head = GRUEncoder(
                hidden=self.n_hid, z_size=self.d_zt * num_rims,
                head_type="prior", dtype=self.dtype,
                param_dtype=self.param_dtype, name="prior_rnn")
        else:
            rim_kw = dict(rim_num_blocks=self.rim_num_blocks,
                          rim_topk=self.rim_topk)
            static_head = ConvGRUEncoderS3(
                out_ch=self.d_zf, head_type="static", mode=self.encoder,
                dtype=self.dtype, param_dtype=self.param_dtype,
                **rim_kw, name="static_rnn")
            dynamic_head = ConvGRUEncoderS3(
                out_ch=self.d_zt, head_type="dynamic", mode=self.encoder,
                dtype=self.dtype, param_dtype=self.param_dtype,
                **rim_kw, name="dynamic_rnn")
            prior_head = ConvGRUEncoderS3(
                out_ch=self.d_zt, head_type="prior", mode="cgru",
                dtype=self.dtype, param_dtype=self.param_dtype,
                name="prior_rnn")
        use_slots = self.slot_att and self.encoder in ("default", "cgru_sa")
        if use_slots:
            mu_sa = SlotAttentionAutoEncoder(
                d_features=self.d_zf, num_slots=self.num_slots,
                num_iterations=self.num_iterations, slot_size=self.slot_size,
                conv_input=not vec, dtype=self.dtype,
                param_dtype=self.param_dtype, name="mu_slot_att")
            lv_sa = SlotAttentionAutoEncoder(
                d_features=self.d_zf, num_slots=self.num_slots,
                num_iterations=self.num_iterations, slot_size=self.slot_size,
                conv_input=not vec, dtype=self.dtype,
                param_dtype=self.param_dtype, name="logvar_slot_att")

        def encode(frames):
            flat = frames.reshape((b * t_in,) + frames.shape[2:])
            feats = frame_enc(flat, train=train)
            if vec:
                return feats.reshape(b, t_in, -1)
            return feats.reshape((b, t_in) + feats.shape[1:])

        def static_rep(feats_in):
            t_use = t_in if self.k_stat == -1 else min(self.k_stat, t_in)
            mu, lv = static_head(feats_in[:, :t_use], train=train)
            if use_slots:
                n = feats_in.shape[0]
                mu = mu_sa(mu).reshape(n, -1)
                lv = lv_sa(lv).reshape(n, -1)
            return mu, lv

        # ---- three static passes: anchor / shuffled-pos / other-neg ---
        feats = encode(inputs)
        perm_t = jax.random.permutation(self.make_rng("sample"), t_in)
        perm_b = jax.random.permutation(self.make_rng("sample"), b)
        # The reference re-encodes the batch-permuted video for the SCC
        # negative (S3VAE.py:251-259); the frame encoder is frame-wise
        # and its BatchNorm statistics are computed over the flattened
        # (b·t) frames — the same multiset under a batch permutation —
        # so re-encoding is mathematically the identity on a permutation
        # of `feats`. Reusing it deletes one of the bench's two encoder
        # passes (pinned equal in test_vae_models.py).
        other_feats = feats[perm_b]

        # The anchor/positive/negative static passes share static_head's
        # parameters and are mutually independent, so stack them on the
        # batch axis and run ONE (3B)-row recurrence instead of three
        # sequential T-step scans. Every deterministic op in the static
        # path (GRU scan, ConvGRU scan, dense/conv heads) is row-wise in
        # the batch, so the stacked pass computes the same function as
        # three separate passes — pinned exact for the vector GRUEncoder
        # path in test_s3vae_static_batch_fusion_is_exact. With
        # slot_att=True the slot-init noise is one make_rng draw for the
        # (3B) batch instead of three draws, so the slot path is
        # equivalent in distribution (per-row iid noise), not bit-equal
        # to the sequential form. The step is scan-latency-bound
        # (PERF_NOTES.md), so deleting two scans is a direct wall-clock
        # win where deleting FLOPs was not.
        mu3, lv3 = static_rep(jnp.concatenate(
            [feats, feats[:, perm_t], other_feats], axis=0))
        mu_zf, pos_mu, neg_mu = jnp.split(mu3, 3, axis=0)
        lv_zf, pos_lv, neg_lv = jnp.split(lv3, 3, axis=0)

        to_std = lambda lv: jnp.exp(0.5 * lv)   # the reference's chain
        std_zf = to_std(lv_zf)
        pos_std, neg_std = to_std(pos_lv), to_std(neg_lv)

        # ---- dynamic posterior + learned prior ------------------------
        if vec:
            mu_zt, lv_zt = dynamic_head(feats, out_seq=out_seq, train=train)
            std_zt = to_std(lv_zt)
            prior_mu, prior_lv = prior_head(
                jnp.concatenate([mu_zt, std_zt], axis=-1), train=train)
        else:
            mu_zt, lv_zt = dynamic_head(
                feats, out_seq=out_seq, timesteps=batch.get("observed_tp"),
                train=train)
            std_zt = to_std(lv_zt)
            prior_mu, prior_lv = prior_head(
                jnp.concatenate([mu_zt, std_zt], axis=-1), train=train)
        prior_std = to_std(prior_lv)

        # ---- reparameterized samples + decode -------------------------
        zf = mu_zf + std_zf * jax.random.normal(
            self.make_rng("sample"), mu_zf.shape, self.dtype)
        zt = mu_zt + std_zt * jax.random.normal(
            self.make_rng("sample"), mu_zt.shape, self.dtype)

        dec = FrameDecoder(encoder_type=self.encoder,
                           final_dim=self.in_channels, dtype=self.dtype,
                           param_dtype=self.param_dtype,
                           name="conv_decoder")

        def decode(zf_in, zt_in):
            if vec:
                zf_rep = jnp.broadcast_to(zf_in[:, None, :],
                                          (b, out_seq, zf_in.shape[-1]))
                zf_zt = jnp.concatenate([zf_rep, zt_in], axis=-1)
                dec_in = zf_zt.reshape(b * out_seq, 1, 1, -1)
            else:
                if use_slots:
                    # cgru_sa: slot vectors broadcast back over the latent
                    # grid and concat channel-wise (the reference's
                    # spatial_broadcast + view, S3VAE.py:271-275).
                    eh, ew = zt_in.shape[2], zt_in.shape[3]
                    zf_sp = jnp.broadcast_to(
                        zf_in[:, None, None, :],
                        (b, eh, ew, zf_in.shape[-1]))
                else:
                    zf_sp = zf_in
                zf_rep = jnp.broadcast_to(
                    zf_sp[:, None], (b, out_seq) + zf_sp.shape[1:])
                zf_zt = jnp.concatenate([zf_rep, zt_in], axis=-1)
                dec_in = zf_zt.reshape((b * out_seq,) + zf_zt.shape[2:])
            x = jax.nn.sigmoid(dec(dec_in, train=train))
            return x.reshape(b, out_seq, h, w, self.in_channels)

        x_hat = decode(zf, zt)

        # DFP motion-grid logits (submodule must live in the compact
        # method; the loss consumes the logits from aux).
        dfp = DFP(z_size=self.d_zt, grids=self.flow_grid**2,
                  spatial=self.encoder != "default", dtype=self.dtype,
                  param_dtype=self.param_dtype, name="dfp_net")
        dfp_logits = dfp(zt).astype(jnp.float32)

        aux = {
            "dfp_logits": dfp_logits,
            "mu_zf": mu_zf, "std_zf": std_zf, "zf": zf,
            "pos_mu": pos_mu, "pos_std": pos_std,
            "neg_mu": neg_mu, "neg_std": neg_std,
            "mu_zt": mu_zt, "std_zt": std_zt, "zt": zt,
            "prior_mu": prior_mu, "prior_std": prior_std,
        }
        if swap:
            # Disentanglement probe decodes (the code_sprite probe-forward
            # pattern, reference code_sprite/models/DS_VAE.py:239-355):
            # donor = batch rolled by one. x_swap_motion keeps each
            # video's content code zf and takes the donor's motion code
            # zt; x_swap_content is the converse.
            aux["x_swap_motion"] = decode(
                zf, jnp.roll(zt, 1, axis=0)).astype(jnp.float32)
            aux["x_swap_content"] = decode(
                jnp.roll(zf, 1, axis=0), zt).astype(jnp.float32)
        return x_hat.astype(jnp.float32), aux

    # ------------------------------------------------------------------
    def loss(self, batch: Dict, train: bool = True):
        x_hat, aux = self.predict(batch, train=train)
        inputs = batch["observed_data"].astype(jnp.float32) + 0.5
        b, t = x_hat.shape[:2]

        target = (batch["data_to_predict"].astype(jnp.float32) + 0.5
                  if self.extrapolate else inputs)
        # Train protocol is symmetric (out_seq == in_seq, 20→20), but the
        # test configs carry long horizons (20→180): initializing/evaluating
        # the loss there compares the common prefix (prediction metrics over
        # the full horizon come from predict(train=False) + the test sweep).
        if target.shape[1] != t:
            n = min(target.shape[1], t)
            target, x_hat = target[:, :n], x_hat[:, :n]
            t = n

        # 1. VAE ELBO (sum-reduced, /(B·T) — reference :342-354).
        recon = jnp.sum(jnp.square(x_hat - target)) / (b * t)
        mu_zf = aux["mu_zf"].astype(jnp.float32)
        std_zf = aux["std_zf"].astype(jnp.float32)
        logvar_zf = 2.0 * jnp.log(std_zf)
        kl_zf = -0.5 * jnp.sum(
            1 + logvar_zf - mu_zf**2 - jnp.exp(logvar_zf)) / (b * t)

        post_mu = aux["mu_zt"].astype(jnp.float32)
        post_std = aux["std_zt"].astype(jnp.float32)
        pri_mu = aux["prior_mu"].astype(jnp.float32)
        pri_std = aux["prior_std"].astype(jnp.float32)
        pri_lv, post_lv = 2 * jnp.log(pri_std), 2 * jnp.log(post_std)
        kl_zt = 0.5 * jnp.sum(
            pri_lv - post_lv
            + (jnp.exp(post_lv) + (post_mu - pri_mu) ** 2) / jnp.exp(pri_lv)
            - 1) / (b * t)
        vae_loss = recon + kl_zf + kl_zt

        # 2. SCC triplet (positives/negatives non-reparameterized, like
        # torch .sample() — gradient flows only through the anchor).
        key = self.make_rng("sample")
        k1, k2, k3 = jax.random.split(key, 3)
        anchor = (mu_zf + std_zf * jax.random.normal(k1, mu_zf.shape))
        pos = jax.lax.stop_gradient(
            aux["pos_mu"] + aux["pos_std"] * jax.random.normal(
                k2, aux["pos_mu"].shape)).astype(jnp.float32)
        neg = jax.lax.stop_gradient(
            aux["neg_mu"] + aux["neg_std"] * jax.random.normal(
                k3, aux["neg_mu"].shape)).astype(jnp.float32)
        scc_loss = scc_triplet_loss(anchor, pos, neg, self.margin)

        # 3. DFP: motion-grid BCE over the T−1 transitions.
        labels = (batch["out_flow_labels"] if self.extrapolate
                  else batch["in_flow_labels"]).astype(jnp.float32)
        logits = aux["dfp_logits"]
        n_lab = min(labels.shape[1], logits.shape[1])
        dfp_loss = dfp_bce_loss(logits[:, :n_lab], labels[:, :n_lab])

        # 4. MI (minibatch-weighted logsumexp entropy estimate, :391-449).
        mi_loss = self._mi_loss(aux, b)

        loss = (self.l0 * vae_loss + self.l1 * scc_loss
                + self.l2 * dfp_loss + self.l3 * mi_loss)
        metrics = {
            "loss": loss, "vae_loss": vae_loss, "recon_loss": recon,
            "kl_zf": kl_zf, "kl_zt": kl_zt, "scc_loss": scc_loss,
            "dfp_loss": dfp_loss, "mi_loss": mi_loss,
        }
        return loss, (metrics, x_hat)

    def _mi_loss(self, aux, b):
        n = self.data_points * self.train_test_split
        log_nm = jnp.log(n * b)

        # Dynamic stats time-first: (B, T, …) → (T, B, …); reparameterized
        # samples, then the pure estimator (parity-tested vs the ref).
        mu_t = jnp.moveaxis(aux["mu_zt"].astype(jnp.float32), 1, 0)
        std_t = jnp.moveaxis(aux["std_zt"].astype(jnp.float32), 1, 0)
        zt_s = mu_t + std_t * jax.random.normal(
            self.make_rng("sample"), mu_t.shape)
        mu_f = aux["mu_zf"].astype(jnp.float32)
        std_f = aux["std_zf"].astype(jnp.float32)
        zf_s = mu_f + std_f * jax.random.normal(
            self.make_rng("sample"), mu_f.shape)
        return mi_estimate(mu_t, std_t, zt_s, mu_f, std_f, zf_s, log_nm)
