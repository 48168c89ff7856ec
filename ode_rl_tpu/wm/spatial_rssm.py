"""Spatial RSSM — the ModelBasedRL_TF_V2 variant.

Capability parity with /root/reference/ModelBasedRL_TF_V2/ (SURVEY §2.7):
the DreamerV2 fork whose latent state is a spatial feature map instead of
a vector —
  * a convolutional GRU recurrence for the deterministic state (the TF
    ConvGRUCell, networks.py ~:598) — here our NHWC ConvGRUCell;
  * ``StochasticConvGRUCell``: learned per-pixel Bernoulli update gates
    (straight-through sampling) with a sparsity penalty on the gate
    activation (networks.py:598-677, sparsity loss wired at
    models.py:66-73);
  * Impala residual CNN encoder option (networks.py:287-359 — our
    nn.ImpalaCNN);
  * spatial posterior/prior heads as 1×1/3×3 convs; observe/imagine
    rollouts mirroring the vector RSSM.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

State = Dict[str, jnp.ndarray]


class StochasticConvGRUCell(nn.Module):
    """Skip-RNN-style ConvGRU (reference ModelBasedRL_TF_V2/networks.py
    :625-677): a plain ConvGRU computes the candidate state, then a
    learned per-CHANNEL Bernoulli gate decides whether each channel of
    the spatial state updates at all this step.

      h̃   = z·tanh(conv([x, r·h])) + (1−z)·h          (ConvGRU)
      p̃   = σ(Dense_C(reshape(Dense_8(per-channel h̃ rows))))  (B, C)
      p'  = u·p̃ + (1−u)·(p + min(1−p, p̃))             (skip accumulation)
      u'  ~ Bernoulli(p')  straight-through             (tools.BernoulliDist)
      h'  = tile(u')·h̃ + (1−tile(u'))·h                (per-channel gate)

    The accumulation term grows the update probability while the gate
    stays closed, so a channel cannot skip forever. Gate convs carry the
    reference's bias_initializer quirks (ones for reset/update, zeros for
    the candidate) and orthogonal kernels. With ``key=None`` the sample
    is replaced by its probability (deterministic eval / parity tests).

    Returns ``(h_next, u_sample', u_prob', u_logit)`` where u_logit = p̃
    is what ``SpatialRSSM.sparsity_loss`` penalizes (networks.py:235-245
    treats it as Bernoulli probs).
    """

    hidden_dim: int
    kernel_size: int = 5
    embed_dim: int = 8
    skip: bool = True
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, h: jnp.ndarray, u_sample: jnp.ndarray,
                 u_prob: jnp.ndarray, x: jnp.ndarray, key=None):
        conv = lambda name, bias_init: nn.Conv(
            self.hidden_dim, (self.kernel_size, self.kernel_size),
            padding="SAME", dtype=self.dtype, param_dtype=self.param_dtype,
            kernel_init=nn.initializers.orthogonal(),
            bias_init=bias_init, name=name)
        ones, zeros = nn.initializers.ones, nn.initializers.zeros
        stacked = jnp.concatenate([x, h], axis=-1)
        update = jax.nn.sigmoid(conv("update", ones)(stacked))
        reset = jax.nn.sigmoid(conv("reset", ones)(stacked))
        cand = jnp.tanh(conv("out", zeros)(
            jnp.concatenate([x, h * reset], axis=-1)))
        h_tilde = update * cand + (1.0 - update) * h

        # Per-channel gate head: (B, S, S, C) → rows (B, C, S²) →
        # Dense(embed) → flatten → Dense(C) → σ (networks.py:659-661).
        b, s1, s2, c = h_tilde.shape
        rows = jnp.moveaxis(h_tilde, -1, 1).reshape(b, c, s1 * s2)
        e = nn.Dense(self.embed_dim, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="update_u1")(rows)
        p_tilde = jax.nn.sigmoid(nn.Dense(
            self.hidden_dim, dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="update_u2")(e.reshape(b, c * self.embed_dim)))

        if self.skip:
            new_u_prob = (u_sample * p_tilde
                          + (1.0 - u_sample)
                          * (u_prob + jnp.minimum(1.0 - u_prob, p_tilde)))
        else:
            new_u_prob = p_tilde

        if key is None:
            new_u_sample = new_u_prob     # deterministic expectation
        else:
            u = jax.random.uniform(key, new_u_prob.shape, new_u_prob.dtype)
            hard = (u < new_u_prob).astype(new_u_prob.dtype)
            new_u_sample = (hard + new_u_prob
                            - jax.lax.stop_gradient(new_u_prob))

        gate = new_u_sample[:, None, None, :]   # tile over space
        h_next = gate * h_tilde + (1.0 - gate) * h
        return h_next, new_u_sample, new_u_prob, p_tilde


class TFConvGRUCell(nn.Module):
    """Deterministic spatial ConvGRU (reference networks.py:598-623):
    separate orthogonal-init update/reset/candidate convs, no
    normalization — h' = z·tanh(conv([x, r·h])) + (1−z)·h."""

    hidden_dim: int
    kernel_size: int = 5
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, h: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
        conv = lambda name: nn.Conv(
            self.hidden_dim, (self.kernel_size, self.kernel_size),
            padding="SAME", dtype=self.dtype, param_dtype=self.param_dtype,
            kernel_init=nn.initializers.orthogonal(), name=name)
        stacked = jnp.concatenate([x, h], axis=-1)
        update = jax.nn.sigmoid(conv("update")(stacked))
        reset = jax.nn.sigmoid(conv("reset")(stacked))
        cand = jnp.tanh(conv("out")(
            jnp.concatenate([x, h * reset], axis=-1)))
        return update * cand + (1.0 - update) * h


class SpatialRSSM(nn.Module):
    """RSSM over (h, w, c) latent maps with conv dynamics."""

    stoch_ch: int = 16
    deter_ch: int = 64
    hidden_ch: int = 64
    latent_hw: int = 16
    min_std: float = 0.1
    stochastic_gates: bool = False   # StochasticConvGRUCell variant
    sparsity_scale: float = 0.0
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        conv = lambda f, k, name: nn.Conv(
            f, (k, k), padding="SAME", dtype=self.dtype,
            param_dtype=self.param_dtype, name=name)
        self._in_conv = conv(self.hidden_ch, 3, "in_conv")
        if self.stochastic_gates:
            self._cell = StochasticConvGRUCell(
                hidden_dim=self.deter_ch, dtype=self.dtype,
                param_dtype=self.param_dtype, name="cell")
        else:
            self._cell = TFConvGRUCell(hidden_dim=self.deter_ch,
                                       dtype=self.dtype,
                                       param_dtype=self.param_dtype,
                                       name="cell")
        self._ims_stat = conv(2 * self.stoch_ch, 3, "ims")
        self._obs_stat = conv(2 * self.stoch_ch, 3, "obs")

    def initial(self, batch: int) -> State:
        hw = self.latent_hw
        z = lambda c: jnp.zeros((batch, hw, hw, c), self.dtype)
        state = {"mean": z(self.stoch_ch), "std": z(self.stoch_ch),
                 "stoch": z(self.stoch_ch), "deter": z(self.deter_ch)}
        if self.stochastic_gates:
            # Gate carries (reference networks.py:58-63 initial()): the
            # Bernoulli sample, its accumulated probability, and the raw
            # per-step gate probability the sparsity loss reads.
            u = lambda: jnp.zeros((batch, self.deter_ch), self.dtype)
            state.update(u_sample=u(), u_prob=u(), u_logit=u())
        return state

    def get_feat(self, state: State) -> jnp.ndarray:
        return jnp.concatenate([state["stoch"], state["deter"]], -1)

    def _stats(self, layer, x) -> State:
        mean, std_raw = jnp.split(layer(x), 2, axis=-1)
        return {"mean": mean,
                "std": jax.nn.softplus(std_raw) + self.min_std}

    def img_step(self, prev: State, key, embed=None) -> Tuple[State, jnp.ndarray]:
        k1, k2 = jax.random.split(key)
        x = self._in_conv(prev["stoch"])
        if self.stochastic_gates:
            deter, u_sample, u_prob, u_logit = self._cell(
                prev["deter"], prev["u_sample"], prev["u_prob"], x, k1)
            gate_p = u_logit
        else:
            deter = self._cell(prev["deter"], x)
            gate_p = jnp.zeros((), self.dtype)
        stats = self._stats(self._ims_stat, deter)
        noise = jax.random.normal(k2, stats["mean"].shape, self.dtype)
        stoch = stats["mean"] + stats["std"] * noise
        prior = {"stoch": stoch, "deter": deter, **stats}
        if self.stochastic_gates:
            prior.update(u_sample=u_sample, u_prob=u_prob, u_logit=u_logit)
        return prior, jnp.mean(gate_p)

    def obs_step(self, prev: State, embed: jnp.ndarray, key
                 ) -> Tuple[State, State, jnp.ndarray]:
        k1, k2 = jax.random.split(key)
        prior, gate_mean = self.img_step(prev, k1)
        x = jnp.concatenate([prior["deter"], embed], -1)
        stats = self._stats(self._obs_stat, x)
        noise = jax.random.normal(k2, stats["mean"].shape, self.dtype)
        stoch = stats["mean"] + stats["std"] * noise
        post = {"stoch": stoch, "deter": prior["deter"], **stats}
        if self.stochastic_gates:
            # posterior shares the prior's gate carries (reference
            # networks.py:161-164)
            post.update(u_sample=prior["u_sample"], u_prob=prior["u_prob"],
                        u_logit=prior["u_logit"])
        return post, prior, gate_mean

    def observe(self, embed: jnp.ndarray, key,
                state: Optional[State] = None):
        """embed: (B, T, h, w, C) → (post, prior, mean gate activation)."""
        b, t = embed.shape[:2]
        if state is None:
            state = self.initial(b)
        keys = jax.random.split(key, t)
        embed_t = jnp.moveaxis(embed, 1, 0)

        def body(mod, carry, xs):
            e_t, k_t = xs
            post, prior, g = mod.obs_step(carry, e_t, k_t)
            return post, (post, prior, g)

        scan = nn.scan(body, variable_broadcast="params",
                       split_rngs={"params": False}, in_axes=0, out_axes=0)
        _, (post, prior, gates) = scan(self, state, (embed_t, keys))
        to_bt = lambda v: jnp.moveaxis(v, 0, 1)
        return (jax.tree_util.tree_map(to_bt, post),
                jax.tree_util.tree_map(to_bt, prior),
                jnp.mean(gates))

    def imagine(self, t: int, state: State, key) -> State:
        """Open-loop prior rollout for t steps from ``state`` →
        time-major-then-(B, T, …) priors (the vector RSSM's imagine,
        reference networks.py, on spatial maps)."""
        keys = jax.random.split(key, t)

        def body(mod, carry, k_t):
            prior, _g = mod.img_step(carry, k_t)
            return prior, prior

        scan = nn.scan(body, variable_broadcast="params",
                       split_rngs={"params": False}, in_axes=0, out_axes=0)
        _, priors = scan(self, state, keys)
        return jax.tree_util.tree_map(lambda v: jnp.moveaxis(v, 0, 1),
                                      priors)

    def kl_loss(self, post: State, prior: State, free: float = 1.0):
        mp = post["mean"].astype(jnp.float32)
        sp = post["std"].astype(jnp.float32)
        mq = prior["mean"].astype(jnp.float32)
        sq = prior["std"].astype(jnp.float32)
        kl = (jnp.log(sq / sp) + (sp**2 + (mp - mq) ** 2) / (2 * sq**2)
              - 0.5)
        kl = jnp.sum(kl, axis=(-3, -2, -1))
        return jnp.maximum(jnp.mean(kl), free)

    def sparsity_loss(self, post: State, prior_prob: float = 0.3,
                      free: float = 0.0, scale: float = 0.1,
                      forward: bool = True):
        """Gate-sparsity penalty (reference networks.py:235-245):
        Bernoulli KL between a fixed gate prior Ber(prior_prob) and the
        per-channel gate probabilities u_logit (the reference passes its
        'u_logit' as probs), Independent over channels; forward=True is
        KL(prior ‖ post), with free-bits floor and scale."""
        eps = 1e-6
        q = jnp.clip(post["u_logit"].astype(jnp.float32), eps, 1.0 - eps)
        p = jnp.clip(jnp.full_like(q, prior_prob), eps, 1.0 - eps)
        a, b = (p, q) if forward else (q, p)
        kl = (a * jnp.log(a / b)
              + (1.0 - a) * jnp.log((1.0 - a) / (1.0 - b)))
        kl = jnp.sum(kl, axis=-1)            # Independent over channels
        return jnp.maximum(jnp.mean(kl), free) * scale


class SpatialWorldModel(nn.Module):
    """Trainable world model over the spatial RSSM — the
    ModelBasedRL_TF_V2 training capability (its models.py wires the
    ConvGRU/StochasticConvGRU dynamics + sparsity loss into the
    DreamerV2 world-model objective) surfaced through this framework's
    uniform loss/predict CLI contract ('SpatialDreamer').

    Encoder keeps the spatial grid (stride-2 convs to latent_hw) instead
    of flattening; decoder mirrors it with transposed convs; loss =
    image NLL + KL(post‖prior) + gate-sparsity Bernoulli KL vs a fixed
    prior (the s_convgru penalty, reference models.py:66-73 with
    dyn_gate_prior/free/scale from its configs.yaml:50-52)."""

    image_shape: Tuple[int, int, int] = (64, 64, 1)
    stoch_ch: int = 16
    deter_ch: int = 64
    hidden_ch: int = 64
    embed_ch: int = 64
    kl_scale: float = 1.0
    kl_free: float = 1.0
    stochastic_gates: bool = True
    sparsity_scale: float = 0.1    # reference dyn_gate_scale default
    gate_prior: float = 0.3        # reference dyn_gate_prior default
    gate_free: float = 0.0         # reference dyn_gate_free default
    initial_frames: int = 10
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        h = self.image_shape[0]
        self.latent_hw = h // 4
        conv = lambda f, k, s, name: nn.Conv(
            f, (k, k), strides=(s, s), padding="SAME", dtype=self.dtype,
            param_dtype=self.param_dtype, name=name)
        deconv = lambda f, name: nn.ConvTranspose(
            f, (4, 4), strides=(2, 2), padding="SAME", dtype=self.dtype,
            param_dtype=self.param_dtype, name=name)
        self._enc1 = conv(self.embed_ch // 2, 4, 2, "enc1")
        self._enc2 = conv(self.embed_ch, 4, 2, "enc2")
        self.dynamics = SpatialRSSM(
            stoch_ch=self.stoch_ch, deter_ch=self.deter_ch,
            hidden_ch=self.hidden_ch, latent_hw=self.latent_hw,
            stochastic_gates=self.stochastic_gates,
            dtype=self.dtype, param_dtype=self.param_dtype,
            name="dynamics")
        self._dec1 = deconv(self.embed_ch // 2, "dec1")
        self._dec2 = deconv(self.image_shape[-1], "dec2")

    # -- pieces ---------------------------------------------------------
    def _encode(self, image: jnp.ndarray) -> jnp.ndarray:
        b, t, h, w, c = image.shape
        x = image.reshape(b * t, h, w, c).astype(self.dtype)
        x = nn.relu(self._enc1(x))
        x = nn.relu(self._enc2(x))
        return x.reshape(b, t, *x.shape[1:])

    def _decode(self, feat: jnp.ndarray) -> jnp.ndarray:
        b, t = feat.shape[:2]
        x = feat.reshape(b * t, *feat.shape[2:])
        x = nn.relu(self._dec1(x))
        x = self._dec2(x)
        return x.reshape(b, t, *x.shape[1:])

    # -- uniform API ----------------------------------------------------
    def loss(self, batch: Dict, train: bool = True, step: int = 0):
        if "image" not in batch:
            video = jnp.concatenate(
                [batch["observed_data"], batch["data_to_predict"]], axis=1)
            batch = {"image": video}
        image = batch["image"].astype(self.dtype)
        if tuple(image.shape[2:]) != tuple(self.image_shape):
            raise ValueError(
                f"SpatialDreamer built for image_shape={self.image_shape} "
                f"but the batch delivers {tuple(image.shape[2:])} — set "
                "--resolution/--in_channels to the dataset's actual frame "
                "geometry (MovingMNIST is fixed 64x64x1)")
        key = self.make_rng("sample")
        embed = self._encode(image)
        post, prior, gate_mean = self.dynamics.observe(embed, key)
        kl = self.dynamics.kl_loss(post, prior, self.kl_free)
        mean = self._decode(self.dynamics.get_feat(post))
        img_lp = jnp.sum(
            -0.5 * (jnp.log(2 * jnp.pi)
                    + (mean.astype(jnp.float32)
                       - image.astype(jnp.float32)) ** 2),
            axis=(-3, -2, -1))
        recon = -jnp.mean(img_lp)
        if self.stochastic_gates:
            sparsity = self.dynamics.sparsity_loss(
                post, prior_prob=self.gate_prior, free=self.gate_free,
                scale=self.sparsity_scale)
        else:
            sparsity = jnp.zeros((), jnp.float32)
        total = recon + self.kl_scale * kl + sparsity
        metrics = {"loss": total, "image_loss": recon, "kl_loss": kl,
                   "gate_mean": gate_mean, "sparsity_loss": sparsity}
        return total, (metrics, mean.astype(jnp.float32))

    def predict(self, batch: Dict, train: bool = False):
        """Open-loop prediction of the to-predict frames (in [0, 1])."""
        n_in = batch["observed_data"].shape[1]
        n_out = batch["data_to_predict"].shape[1]
        key = self.make_rng("sample")
        k1, k2 = jax.random.split(key)
        embed = self._encode(batch["observed_data"].astype(self.dtype))
        post, _, _ = self.dynamics.observe(embed, k1)
        init = jax.tree_util.tree_map(lambda v: v[:, n_in - 1], post)
        priors = self.dynamics.imagine(n_out, init, k2)
        openl = self._decode(self.dynamics.get_feat(priors))
        return openl.astype(jnp.float32) + 0.5, {}
