"""Disentangled sequential VAE (the code_sprite / S3VAE-origin model).

Capability parity with
/root/reference/code_sprite/models/DS_VAE.py:44-503
(DisentangledVAE_ICLR_V1):
  * shared bi-LSTM over per-frame DCGAN features; the content latent f
    reads [forward-last, backward-first] (:102-134); the motion latents
    z_1..z_T come from a one-directional RNN over the bi-LSTM outputs
    with per-step mean/logvar heads (:135-150);
  * a learned two-layer LSTM prior over z, teacher-forced on the
    posterior during training (sample_z_prior_train :430-464) and rolled
    out freely for generation (sample_z_prior_test :396-428);
  * motion-area (9-way) and 8-direction-bin predictor heads on z
    (:80-101);
  * decode concat(z_t, f) per frame (:219-224);
  * the probe forwards used by the disentanglement evaluation —
    exchange / fixed_motion / fixed_content / generating (:239-355);
  * the training losses (train_DS_VAE_sprite.py:144-220): sum-reduced
    reconstruction, KL(f ‖ N(0,1)), KL(z ‖ learned prior), plus triplet
    and motion supervision wired by the training script (the same loss
    family S3VAE inherits — reused from models/s3vae.py patterns).
"""

from __future__ import annotations

from typing import Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from ode_rl_tpu.sprite.nets import DCGANDecoder, DCGANEncoder


class _FusedLSTMParams(nn.Module):
    """Declares the exact param tree of ``nn.OptimizedLSTMCell`` (i-side
    i{i,f,g,o} Dense without bias, h-side h{i,f,g,o} with) without
    computing — same path/names ⇒ bit-identical init and checkpoint
    compatibility (see nn/s3vae_nets._FusedGRUParams)."""

    hidden: int
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xs: jnp.ndarray, h0: jnp.ndarray):
        from flax.linen.recurrent import DenseParams

        mk = lambda name, use_bias, init, ref: DenseParams(
            features=self.hidden, use_bias=use_bias,
            param_dtype=self.param_dtype, kernel_init=init,
            bias_init=nn.initializers.zeros_init(), name=name)(ref)
        ki = nn.linear.default_kernel_init
        kh = nn.initializers.orthogonal()
        return ([mk(f"i{c}", False, ki, xs) for c in "ifgo"],
                [mk(f"h{c}", True, kh, h0) for c in "ifgo"])


class _LSTM(nn.Module):
    """Unidirectional LSTM over (B, T, F) → outputs (B, T, H).

    Math and param tree are exactly ``nn.scan`` of
    ``nn.OptimizedLSTMCell``, restructured cuDNN-style: the input
    projections of ALL timesteps run as one (B·T, F)×(F, 4H) matmul
    before the scan; only the (B, H)×(H, 4H) hidden matmul + gate math
    stays in the sequential loop (pinned in tests/test_fast_rnn.py)."""

    hidden: int
    reverse: bool = False
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xs):
        from flax.linen.dtypes import promote_dtype

        b = xs.shape[0]
        h0 = jnp.zeros((b, self.hidden), self.dtype)
        i_params, h_params = _FusedLSTMParams(
            hidden=self.hidden, param_dtype=self.param_dtype,
            name="cell")(xs, h0)
        w_i = jnp.concatenate([k for k, _ in i_params], axis=-1)
        w_h = jnp.concatenate([k for k, _ in h_params], axis=-1)
        b_h = jnp.concatenate([bb for _, bb in h_params], axis=-1)
        xs, h0, w_i, w_h, b_h = promote_dtype(
            xs, h0, w_i, w_h, b_h, dtype=self.dtype)

        x_proj = xs @ w_i                              # (B, T, 4H)

        def step(carry, xp):
            c, h = carry
            hh = h @ w_h + b_h
            hi, hf, hg, ho = jnp.split(hh, 4, axis=-1)
            xi, xf, xg, xo = jnp.split(xp, 4, axis=-1)
            i = jax.nn.sigmoid(hi + xi)
            f = jax.nn.sigmoid(hf + xf)
            g = jnp.tanh(hg + xg)
            o = jax.nn.sigmoid(ho + xo)
            c_new = f * c + i * g
            h_new = o * jnp.tanh(c_new)
            return (c_new, h_new), h_new

        # reverse=True consumes xs back-to-front and writes outputs
        # back into their original positions — same time alignment as
        # nn.scan(reverse=True) over the cell.
        _, outs = jax.lax.scan(step, (h0, h0),
                               jnp.swapaxes(x_proj, 0, 1),
                               reverse=self.reverse)
        return jnp.swapaxes(outs, 0, 1)


class DisentangledVAE(nn.Module):
    f_dim: int = 256
    z_dim: int = 32
    g_dim: int = 128
    channels: int = 3
    hidden_dim: int = 256
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = DCGANEncoder(g_dim=self.g_dim, dtype=self.dtype,
                                    param_dtype=self.param_dtype)
        self.decoder = DCGANDecoder(out_channels=self.channels,
                                    dtype=self.dtype,
                                    param_dtype=self.param_dtype)
        self.lstm_fwd = _LSTM(self.hidden_dim, dtype=self.dtype,
                              param_dtype=self.param_dtype)
        self.lstm_bwd = _LSTM(self.hidden_dim, reverse=True,
                              dtype=self.dtype,
                              param_dtype=self.param_dtype)
        dense = lambda f, name: nn.Dense(f, dtype=self.dtype,
                                         param_dtype=self.param_dtype,
                                         name=name)
        self.f_mean = dense(self.f_dim, "f_mean")
        self.f_logvar = dense(self.f_dim, "f_logvar")
        self.z_rnn_i = dense(self.hidden_dim, "z_rnn_i")
        self.z_rnn_h = dense(self.hidden_dim, "z_rnn_h")
        self.z_mean = dense(self.z_dim, "z_mean")
        self.z_logvar = dense(self.z_dim, "z_logvar")
        # Learned two-layer LSTM prior over z.
        self.prior_ly1 = nn.OptimizedLSTMCell(features=self.hidden_dim,
                                              dtype=self.dtype,
                                              param_dtype=self.param_dtype)
        self.prior_ly2 = nn.OptimizedLSTMCell(features=self.hidden_dim,
                                              dtype=self.dtype,
                                              param_dtype=self.param_dtype)
        self.z_prior_mean = dense(self.z_dim, "z_prior_mean")
        self.z_prior_logvar = dense(self.z_dim, "z_prior_logvar")
        # Motion heads: 9-area + 9×8 direction bins.
        self.area_head_0 = dense(2 * self.z_dim, "area_0")
        self.area_head_1 = dense(9, "area_1")
        self.dir_heads_0 = [dense(2 * self.z_dim, f"dir{i}_0")
                            for i in range(9)]
        self.dir_heads_1 = [dense(8, f"dir{i}_1") for i in range(9)]

    # ------------------------------------------------------------------
    def _reparam(self, mean, logvar, key, sampling=True):
        if not sampling:
            return mean
        std = jnp.exp(0.5 * logvar)
        return mean + std * jax.random.normal(key, mean.shape, mean.dtype)

    def encode_frames(self, x, train=True):
        b, t = x.shape[:2]
        flat = x.reshape((b * t,) + x.shape[2:])
        g = self.encoder(flat, train=train)
        return g.reshape(b, t, self.g_dim)

    def encode_and_sample_post(self, x, key, train=True):
        conv_x = self.encode_frames(x, train=train)
        fwd = self.lstm_fwd(conv_x)
        bwd = self.lstm_bwd(conv_x)
        # content: forward at T-1, backward at 0 (reference :118-126)
        lstm_out_f = jnp.concatenate([fwd[:, -1], bwd[:, 0]], axis=-1)
        f_mean = self.f_mean(lstm_out_f)
        f_logvar = self.f_logvar(lstm_out_f)
        k1, k2 = jax.random.split(key)
        f_post = self._reparam(f_mean, f_logvar, k1)

        # motion: tanh RNN over the concatenated bi-LSTM outputs
        bi = jnp.concatenate([fwd, bwd], axis=-1)
        b, t = bi.shape[:2]

        def rnn_body(h, x_t):
            h_new = jnp.tanh(self.z_rnn_i(x_t) + self.z_rnn_h(h))
            return h_new, h_new

        h = jnp.zeros((b, self.hidden_dim), self.dtype)
        feats = []
        for i in range(t):  # short static horizon — unrolled
            h, out = rnn_body(h, bi[:, i])
            feats.append(out)
        features = jnp.stack(feats, axis=1)
        z_mean = self.z_mean(features)
        z_logvar = self.z_logvar(features)
        z_post = self._reparam(z_mean, z_logvar, k2)
        return f_mean, f_logvar, f_post, z_mean, z_logvar, z_post

    # ------------------------------------------------------------------
    def _prior_rollout(self, frames, key, z_teacher=None, batch=None):
        """Two-layer LSTM prior; teacher-forced on z_teacher if given."""
        b = batch if z_teacher is None else z_teacher.shape[0]
        z_t = jnp.zeros((b, self.z_dim), self.dtype)
        c1 = (jnp.zeros((b, self.hidden_dim), self.dtype),) * 2
        c2 = (jnp.zeros((b, self.hidden_dim), self.dtype),) * 2
        means, logvars, zs = [], [], []
        keys = jax.random.split(key, frames)
        for i in range(frames):
            c1, h1 = self.prior_ly1(c1, z_t)
            c2, h2 = self.prior_ly2(c2, h1)
            m = self.z_prior_mean(h2)
            lv = self.z_prior_logvar(h2)
            z_prior = self._reparam(m, lv, keys[i])
            means.append(m)
            logvars.append(lv)
            zs.append(z_prior)
            z_t = z_teacher[:, i] if z_teacher is not None else z_prior
        stack = lambda xs: jnp.stack(xs, axis=1)
        return stack(means), stack(logvars), stack(zs)

    def _decode(self, z_post, f_post, train=True):
        b, t = z_post.shape[:2]
        f_expand = jnp.broadcast_to(f_post[:, None],
                                    (b, t, self.f_dim))
        zf = jnp.concatenate([z_post, f_expand], axis=-1)
        frames = self.decoder(zf.reshape(b * t, -1), train=train)
        return frames.reshape((b, t) + frames.shape[1:])

    # ------------------------------------------------------------------
    def __call__(self, x, train: bool = True):
        """Full forward (reference forward :167-227): returns posterior
        stats, learned-prior stats, reconstruction, motion logits."""
        key = self.make_rng("sample")
        k1, k2 = jax.random.split(key)
        f_mean, f_logvar, f_post, z_mean, z_logvar, z_post = \
            self.encode_and_sample_post(x, k1, train=train)
        pm, plv, pz = self._prior_rollout(z_post.shape[1], k2,
                                          z_teacher=z_post)
        recon = self._decode(z_post, f_post, train=train)
        z_flat = z_post.reshape(-1, self.z_dim)
        lrelu = lambda v: jax.nn.leaky_relu(v, negative_slope=0.2)
        pred_area = self.area_head_1(lrelu(self.area_head_0(z_flat)))
        pred_dirs = jnp.concatenate(
            [h1(lrelu(h0(z_flat)))
             for h0, h1 in zip(self.dir_heads_0, self.dir_heads_1)], axis=0)
        return {
            "f_mean": f_mean, "f_logvar": f_logvar, "f_post": f_post,
            "z_mean": z_mean, "z_logvar": z_logvar, "z_post": z_post,
            "z_mean_prior": pm, "z_logvar_prior": plv, "z_prior": pz,
            "recon": recon, "pred_area": pred_area, "pred_dirs": pred_dirs,
        }

    def loss(self, batch: Dict, train: bool = True):
        """ELBO with the learned z-prior (train_DS_VAE_sprite.py losses)."""
        x = batch["observed_data"].astype(self.dtype) + 0.5
        out = self(x, train=train)
        b, t = x.shape[:2]
        f32 = lambda v: out[v].astype(jnp.float32)
        recon = jnp.sum(jnp.square(out["recon"].astype(jnp.float32)
                                   - x.astype(jnp.float32))) / b
        f_lv, f_m = f32("f_logvar"), f32("f_mean")
        kl_f = -0.5 * jnp.sum(1 + f_lv - f_m**2 - jnp.exp(f_lv)) / b
        zm, zlv = f32("z_mean"), f32("z_logvar")
        pm, plv = f32("z_mean_prior"), f32("z_logvar_prior")
        kl_z = 0.5 * jnp.sum(
            plv - zlv + (jnp.exp(zlv) + (zm - pm) ** 2) / jnp.exp(plv)
            - 1) / b
        loss = recon + kl_f + kl_z
        metrics = {"loss": loss, "recon_loss": recon, "kl_f": kl_f,
                   "kl_z": kl_z}
        return loss, (metrics, out["recon"].astype(jnp.float32))

    def predict(self, batch: Dict, train: bool = False):
        x = batch["observed_data"].astype(self.dtype) + 0.5
        out = self(x, train=train)
        return out["recon"].astype(jnp.float32), {}

    # --------------------- probe forwards (evaluation) -----------------
    def forward_exchange(self, x, train: bool = False):
        """Swap content f between consecutive batch pairs (:239-252)."""
        key = self.make_rng("sample")
        _, _, f_post, _, _, z_post = self.encode_and_sample_post(
            x, key, train=train)
        b = f_post.shape[0]
        perm = jnp.arange(b)
        perm = perm.reshape(-1, 2)[:, ::-1].reshape(-1)  # swap pairs
        return self._decode(z_post, f_post[perm], train=train)

    def forward_fixed_content_for_classification(self, x, train=False):
        """Disagreement-protocol generator (reference DS_VAE.py:289-303):
        motion resampled from the free prior rollout (its per-step MEANS
        drive the decode), content pinned to the posterior mean. Returns
        (generation, posterior-mean recon)."""
        key = self.make_rng("sample")
        k1, k2 = jax.random.split(key)
        f_mean, _, _, z_mean_post, _, _ = self.encode_and_sample_post(
            x, k1, train=train)
        b, t = x.shape[:2]
        z_mean_prior, _, _ = self._prior_rollout(t, k2, batch=b)
        recon_sample = self._decode(z_mean_prior, f_mean, train=train)
        recon = self._decode(z_mean_post, f_mean, train=train)
        return recon_sample, recon

    def forward_fixed_action_for_classification(self, x, train=False):
        """Disagreement-protocol generator (reference DS_VAE.py:305-322):
        motion pinned to the posterior means, content resampled from
        N(0, I). Returns (generation, posterior-mean recon)."""
        key = self.make_rng("sample")
        k1, k2 = jax.random.split(key)
        f_mean, _, _, z_mean_post, _, _ = self.encode_and_sample_post(
            x, k1, train=train)
        f_prior = jax.random.normal(k2, f_mean.shape, f_mean.dtype)
        recon_sample = self._decode(z_mean_post, f_prior, train=train)
        recon = self._decode(z_mean_post, f_mean, train=train)
        return recon_sample, recon

    def forward_fixed_motion(self, x, train: bool = False):
        """Same z for all, per-sample f (:265-275)."""
        key = self.make_rng("sample")
        _, _, f_post, _, _, z_post = self.encode_and_sample_post(
            x, key, train=train)
        z_fixed = jnp.broadcast_to(z_post[:1], z_post.shape)
        return self._decode(z_fixed, f_post, train=train)

    def forward_fixed_content(self, x, train: bool = False):
        """Same f for all, per-sample z (:276-288)."""
        key = self.make_rng("sample")
        _, _, f_post, _, _, z_post = self.encode_and_sample_post(
            x, key, train=train)
        f_fixed = jnp.broadcast_to(f_post[:1], f_post.shape)
        return self._decode(z_post, f_fixed, train=train)

    def forward_generating(self, x, train: bool = False):
        """Posterior f + free-running prior z (:325-339)."""
        key = self.make_rng("sample")
        k1, k2 = jax.random.split(key)
        _, _, f_post, _, _, z_post = self.encode_and_sample_post(
            x, k1, train=train)
        _, _, z_gen = self._prior_rollout(z_post.shape[1], k2,
                                         batch=f_post.shape[0])
        return self._decode(z_gen, f_post, train=train)
