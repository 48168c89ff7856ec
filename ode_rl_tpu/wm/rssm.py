"""Recurrent State-Space Model (RSSM).

Capability parity with /root/reference/dreamerv2/networks.py:10-189 and
:376-405: stochastic + deterministic latent state, discrete (one-hot,
straight-through) or Gaussian latents with the reference's mean/std
activation menu and min_std, a LayerNorm GRU cell with update-gate bias
−1, posterior from [deter, embed] (temp_post), ``observe`` /
``imagine`` rollouts, and balanced KL with free bits (:172-189).

TPU-first: the TF ``static_scan`` unrolls become ``lax.scan`` over the
time axis with explicit per-step PRNG keys; states are dicts scanned as
pytrees.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ode_rl_tpu.wm.tools import one_hot_st_sample

State = Dict[str, jnp.ndarray]


class NormGRUCell(nn.Module):
    """GRU with optional LayerNorm on the fused gate preactivations and
    update-gate bias (reference networks.py:376-405)."""

    size: int
    norm: bool = True
    update_bias: float = -1.0
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, state: jnp.ndarray) -> jnp.ndarray:
        parts = nn.Dense(3 * self.size, use_bias=self.norm,
                         dtype=self.dtype, param_dtype=self.param_dtype,
                         name="fused")(jnp.concatenate([x, state], -1))
        if self.norm:
            parts = nn.LayerNorm(dtype=jnp.float32, name="norm")(
                parts.astype(jnp.float32)).astype(parts.dtype)
        reset, cand, update = jnp.split(parts, 3, axis=-1)
        reset = jax.nn.sigmoid(reset)
        cand = jnp.tanh(reset * cand)
        update = jax.nn.sigmoid(update + self.update_bias)
        return update * cand + (1.0 - update) * state


def _act(name):
    return {"elu": jax.nn.elu, "relu": jax.nn.relu,
            "silu": jax.nn.silu, "tanh": jnp.tanh}[name]


class RSSM(nn.Module):
    stoch: int = 30
    deter: int = 200
    hidden: int = 200
    layers_input: int = 1
    layers_output: int = 1
    rec_depth: int = 1
    discrete: int = 0          # 0 → Gaussian; else categories per factor
    act: str = "elu"
    mean_act: str = "none"
    std_act: str = "softplus"
    temp_post: bool = True
    min_std: float = 0.1
    cell_norm: bool = True
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        dense = lambda f, name: nn.Dense(
            f, dtype=self.dtype, param_dtype=self.param_dtype, name=name)
        self._in_layers = [dense(self.hidden, f"ini{i}")
                           for i in range(self.layers_input)]
        # First img-out layer declared as raw Dense params (same "imo0"
        # path/names ⇒ same param tree and checkpoints) so the observe
        # scan can merge its matmul with the posterior's deter-side
        # contraction: deter @ [W_imo0 | K_obi0[:D]] is ONE (D, 2H)
        # matmul per step instead of two (D, H) launches — both consume
        # the same deter', and per-column reductions make the merge
        # bit-exact. Mirrors the "obi0" hoist below.
        from flax.linen.recurrent import DenseParams

        self._img_p0 = (DenseParams(features=self.hidden,
                                    param_dtype=self.param_dtype,
                                    name="imo0")
                        if self.layers_output else None)
        self._img_out_layers_rest = [dense(self.hidden, f"imo{i}")
                                     for i in range(1, self.layers_output)]
        # First posterior layer is declared as raw Dense params (same
        # "obi0" path/names ⇒ same param tree and checkpoints) so
        # observe() can hoist its embed-side columns out of the scan:
        # concat([deter, embed]) @ K == deter @ K[:D] + embed @ K[D:],
        # and the embed half of ALL timesteps is one big (B·T, E)×(E, H)
        # matmul on the MXU instead of T sequential ones. The embed
        # projection is the single largest matmul in the posterior scan
        # body (E > deter in every shipped config).
        from flax.linen.recurrent import DenseParams

        self._obs_p0 = DenseParams(features=self.hidden,
                                   param_dtype=self.param_dtype,
                                   name="obi0")
        self._obs_layers_rest = [dense(self.hidden, f"obi{i}")
                                 for i in range(1, self.layers_output)]
        stats_width = (self.stoch * self.discrete if self.discrete
                       else 2 * self.stoch)
        self._ims_stat = dense(stats_width, "ims")
        self._obs_stat = dense(stats_width, "obs")
        self._cell = NormGRUCell(size=self.deter, norm=self.cell_norm,
                                 dtype=self.dtype,
                                 param_dtype=self.param_dtype, name="cell")

    # ------------------------------------------------------------------
    def initial(self, batch: int) -> State:
        if self.discrete:
            shape = (batch, self.stoch, self.discrete)
            return {"logit": jnp.zeros(shape, self.dtype),
                    "stoch": jnp.zeros(shape, self.dtype),
                    "deter": jnp.zeros((batch, self.deter), self.dtype)}
        return {"mean": jnp.zeros((batch, self.stoch), self.dtype),
                "std": jnp.zeros((batch, self.stoch), self.dtype),
                "stoch": jnp.zeros((batch, self.stoch), self.dtype),
                "deter": jnp.zeros((batch, self.deter), self.dtype)}

    def get_feat(self, state: State) -> jnp.ndarray:
        stoch = state["stoch"]
        if self.discrete:
            stoch = stoch.reshape(stoch.shape[:-2]
                                  + (self.stoch * self.discrete,))
        return jnp.concatenate([stoch, state["deter"]], -1)

    # ------------------------------------------------------------------
    def _stats(self, layer, x: jnp.ndarray) -> State:
        x = layer(x)
        if self.discrete:
            logit = x.reshape(x.shape[:-1] + (self.stoch, self.discrete))
            return {"logit": logit}
        mean, std = jnp.split(x, 2, -1)
        mean = {"none": lambda m: m,
                "tanh5": lambda m: 5.0 * jnp.tanh(m / 5.0)}[self.mean_act](mean)
        std = {
            "softplus": jax.nn.softplus,
            "abs": lambda s: jnp.abs(s + 1.0),
            "sigmoid": jax.nn.sigmoid,
            "sigmoid2": lambda s: 2.0 * jax.nn.sigmoid(s / 2.0),
        }[self.std_act](std)
        return {"mean": mean, "std": std + self.min_std}

    def _sample(self, stats: State, key, sample: bool = True) -> jnp.ndarray:
        if self.discrete:
            if sample:
                return one_hot_st_sample(key, stats["logit"])
            idx = jnp.argmax(stats["logit"], -1)
            return jax.nn.one_hot(idx, self.discrete,
                                  dtype=stats["logit"].dtype)
        if sample:
            noise = jax.random.normal(key, stats["mean"].shape,
                                      stats["mean"].dtype)
            return stats["mean"] + stats["std"] * noise
        return stats["mean"]

    # -- pre-drawn sampling noise (scan paths) -------------------------
    # threefry is VPU-serial work; drawing T tiny tensors inside a scan
    # costs T sequential RNG computations on the latency-critical path.
    # The draws are distribution-parameter-independent (gumbel-argmax
    # for categorical, affine for Gaussian), so the scans draw ALL
    # steps' noise in one batched op outside and the body applies it —
    # bit-identical: same subkeys, same primitives, and float addition
    # commutes in `argmax(logits + g)`.

    def _draw_noise(self, key, batch: int) -> jnp.ndarray:
        if self.discrete:
            return jax.random.gumbel(
                key, (batch, self.stoch, self.discrete), self.dtype)
        return jax.random.normal(key, (batch, self.stoch), self.dtype)

    def _apply_noise(self, stats: State, noise: jnp.ndarray) -> jnp.ndarray:
        if self.discrete:
            logit = stats["logit"]
            idx = jnp.argmax(noise.astype(logit.dtype) + logit, -1)
            sample = jax.nn.one_hot(idx, self.discrete, dtype=logit.dtype)
            probs = jax.nn.softmax(logit)
            return sample + probs - jax.lax.stop_gradient(probs)
        return stats["mean"] + stats["std"] * noise.astype(stats["mean"].dtype)

    # ------------------------------------------------------------------
    def _img_deter(self, prev_state: State,
                   action: jnp.ndarray = None) -> jnp.ndarray:
        """Prior recurrence up to the new deterministic state."""
        act = _act(self.act)
        prev_stoch = prev_state["stoch"]
        if self.discrete:
            prev_stoch = prev_stoch.reshape(
                prev_stoch.shape[:-2] + (self.stoch * self.discrete,))
        x = prev_stoch
        if action is not None:
            x = jnp.concatenate([x, action.astype(x.dtype)], -1)
        for layer in self._in_layers:
            x = act(layer(x))
        deter = prev_state["deter"]
        for _ in range(self.rec_depth):
            deter = self._cell(x, deter)
            x = deter
        return deter

    def _img_first(self, x: jnp.ndarray) -> jnp.ndarray:
        """Full first-img-out-layer preactivation — exactly
        ``nn.Dense(name='imo0')``."""
        from flax.linen.dtypes import promote_dtype

        k, b = self._img_p0(x)
        x, k, b = promote_dtype(x, k, b, dtype=self.dtype)
        return x @ k + b

    def _img_trunk(self, pre: jnp.ndarray) -> jnp.ndarray:
        """Img-out trunk given the first layer's preactivation."""
        act = _act(self.act)
        x = act(pre)
        for layer in self._img_out_layers_rest:
            x = act(layer(x))
        return x

    def img_step(self, prev_state: State, key, sample: bool = True,
                 action: jnp.ndarray = None) -> State:
        """Prior transition. ``action`` (B, A) optionally conditions the
        dynamics — the reference RSSM always concatenates prev_action to
        prev_stoch (dreamerv2/networks.py img_step); the video models
        here run action-free, so it stays optional."""
        deter = self._img_deter(prev_state, action=action)
        x = (self._img_trunk(self._img_first(deter))
             if self.layers_output else deter)
        stats = self._stats(self._ims_stat, x)
        stoch = self._sample(stats, key, sample)
        return {"stoch": stoch, "deter": deter, **stats}

    def _obs_trunk(self, pre: jnp.ndarray) -> jnp.ndarray:
        """Posterior trunk given the first layer's preactivation."""
        act = _act(self.act)
        x = act(pre)
        for layer in self._obs_layers_rest:
            x = act(layer(x))
        return x

    def _obs_first(self, x: jnp.ndarray) -> jnp.ndarray:
        """Full (unsplit) first-posterior-layer preactivation — exactly
        ``nn.Dense(name='obi0')``."""
        from flax.linen.dtypes import promote_dtype

        k, b = self._obs_p0(x)
        x, k, b = promote_dtype(x, k, b, dtype=self.dtype)
        return x @ k + b

    def obs_step(self, prev_state: State, embed: jnp.ndarray, key,
                 sample: bool = True,
                 action: jnp.ndarray = None) -> Tuple[State, State]:
        k1, k2 = jax.random.split(key)
        prior = self.img_step(prev_state, k1, sample, action=action)
        x = (jnp.concatenate([prior["deter"], embed], -1)
             if self.temp_post else embed)
        x = self._obs_trunk(self._obs_first(x))
        stats = self._stats(self._obs_stat, x)
        stoch = self._sample(stats, k2, sample)
        post = {"stoch": stoch, "deter": prior["deter"], **stats}
        return post, prior

    def _obs_step_fast(self, prev_state: State, pre: jnp.ndarray,
                       k_deter: jnp.ndarray, n_prior: jnp.ndarray,
                       n_post: jnp.ndarray,
                       action: jnp.ndarray = None) -> Tuple[State, State]:
        """Scan-body obs step: hoisted embed-side preactivation ``pre``
        (= embed @ K[D:] + b), pre-drawn sampling noise, and — when
        ``layers_output == 1`` (every shipped config) — the img-out and
        posterior deter-side matmuls merged into one (D, 2H)
        contraction (each output column is an independent reduction, so
        the merge is bit-exact vs two separate dots)."""
        deter = self._img_deter(prev_state, action=action)
        if self.layers_output == 1:
            from flax.linen.dtypes import promote_dtype

            k_o, b_o = self._img_p0(deter)
            d_p, k_o, b_o = promote_dtype(deter, k_o, b_o, dtype=self.dtype)
            both = d_p @ jnp.concatenate(
                [k_o, k_deter.astype(k_o.dtype)], axis=1)
            x_img = self._img_trunk(both[..., :self.hidden] + b_o)
            post_pre = pre + both[..., self.hidden:]
        else:
            x_img = (self._img_trunk(self._img_first(deter))
                     if self.layers_output else deter)
            post_pre = pre + deter.astype(pre.dtype) @ k_deter
        prior_stats = self._stats(self._ims_stat, x_img)
        prior = {"stoch": self._apply_noise(prior_stats, n_prior),
                 "deter": deter, **prior_stats}
        x = self._obs_trunk(post_pre)
        stats = self._stats(self._obs_stat, x)
        post = {"stoch": self._apply_noise(stats, n_post),
                "deter": deter, **stats}
        return post, prior

    # ------------------------------------------------------------------
    def observe(self, embed: jnp.ndarray, key,
                state: Optional[State] = None,
                actions: Optional[jnp.ndarray] = None
                ) -> Tuple[State, State]:
        """embed: (B, T, E) → (post, prior) with (B, T, …) leaves.
        ``actions`` (B, T, A) optionally conditions each transition
        (action_t precedes obs_t, the reference's convention)."""
        b, t = embed.shape[:2]
        if state is None:
            state = self.initial(b)
        keys = jax.random.split(key, t)

        if self.temp_post:
            # Hoisted posterior input projection (see setup): the
            # embed-side half of obi0 for ALL timesteps runs as one
            # batched matmul before the scan; the scan body keeps only
            # the deter-side (D, H) matmul (merged with imo0 inside
            # _obs_step_fast). Sampling noise for all T steps is drawn
            # in one batched op here — see _draw_noise.
            from flax.linen.dtypes import promote_dtype

            k0, b0 = self._obs_p0(
                jnp.zeros((1, self.deter + embed.shape[-1]), embed.dtype))
            e_p, k_p, b_p = promote_dtype(embed, k0, b0, dtype=self.dtype)
            pre_t = jnp.moveaxis(e_p @ k_p[self.deter:] + b_p, 1, 0)
            k_deter = k_p[:self.deter]
            subkeys = jax.vmap(jax.random.split)(keys)       # (T, 2)
            n_prior = jax.vmap(
                lambda k: self._draw_noise(k, b))(subkeys[:, 0])
            n_post = jax.vmap(
                lambda k: self._draw_noise(k, b))(subkeys[:, 1])

            def body_pre(mod, carry, xs):
                p_t, np_t, nq_t, a_t = xs
                post, prior = mod._obs_step_fast(carry, p_t, k_deter,
                                                 np_t, nq_t, action=a_t)
                return post, (post, prior)

            scan_p = nn.scan(body_pre, variable_broadcast="params",
                             split_rngs={"params": False}, in_axes=0,
                             out_axes=0)
            actions_t = (None if actions is None
                         else jnp.moveaxis(actions, 1, 0))
            _, (post, prior) = scan_p(self, state,
                                      (pre_t, n_prior, n_post, actions_t))
            to_bt = lambda v: jnp.moveaxis(v, 0, 1)
            return (jax.tree_util.tree_map(to_bt, post),
                    jax.tree_util.tree_map(to_bt, prior))

        embed_t = jnp.moveaxis(embed, 1, 0)

        if actions is not None:
            actions_t = jnp.moveaxis(actions, 1, 0)

            def body_a(mod, carry, xs):
                e_t, k_t, a_t = xs
                post, prior = mod.obs_step(carry, e_t, k_t, action=a_t)
                return post, (post, prior)

            scan_a = nn.scan(body_a, variable_broadcast="params",
                             split_rngs={"params": False}, in_axes=0,
                             out_axes=0)
            _, (post, prior) = scan_a(self, state,
                                      (embed_t, keys, actions_t))
            to_bt = lambda v: jnp.moveaxis(v, 0, 1)
            return (jax.tree_util.tree_map(to_bt, post),
                    jax.tree_util.tree_map(to_bt, prior))

        def body(mod, carry, xs):
            e_t, k_t = xs
            post, prior = mod.obs_step(carry, e_t, k_t)
            return post, (post, prior)

        scan = nn.scan(body, variable_broadcast="params",
                       split_rngs={"params": False}, in_axes=0, out_axes=0)
        _, (post, prior) = scan(self, state, (embed_t, keys))
        to_bt = lambda v: jnp.moveaxis(v, 0, 1)
        return (jax.tree_util.tree_map(to_bt, post),
                jax.tree_util.tree_map(to_bt, prior))

    def imagine(self, n_steps: int, state: State, key) -> State:
        """Open-loop prior rollout for n_steps from ``state``. Sampling
        noise for all steps is pre-drawn (bit-identical to per-step
        ``img_step(key_t)`` — same keys, same primitives)."""
        keys = jax.random.split(key, n_steps)
        b = state["deter"].shape[0]
        noise = jax.vmap(lambda k: self._draw_noise(k, b))(keys)

        def body(mod, carry, n_t):
            deter = mod._img_deter(carry)
            x = (mod._img_trunk(mod._img_first(deter))
                 if mod.layers_output else deter)
            stats = mod._stats(mod._ims_stat, x)
            prior = {"stoch": mod._apply_noise(stats, n_t),
                     "deter": deter, **stats}
            return prior, prior

        scan = nn.scan(body, variable_broadcast="params",
                       split_rngs={"params": False}, in_axes=0, out_axes=0)
        _, prior = scan(self, state, noise)
        return jax.tree_util.tree_map(lambda v: jnp.moveaxis(v, 0, 1), prior)

    # ------------------------------------------------------------------
    def entropy(self, state: State) -> jnp.ndarray:
        """Latent-distribution entropy summed over factors (the
        reference's prior_ent/post_ent diagnostics, models.py:75-77)."""
        if self.discrete:
            lp = jax.nn.log_softmax(state["logit"].astype(jnp.float32))
            return -jnp.sum(jnp.exp(lp) * lp, axis=(-2, -1))
        std = state["std"].astype(jnp.float32)
        return jnp.sum(0.5 * jnp.log(2 * jnp.pi * jnp.e * std**2), -1)

    def _logprob_and_kl(self, post: State, prior: State):
        """KL(post ‖ prior) per element, fp32."""
        if self.discrete:
            lp = jax.nn.log_softmax(post["logit"].astype(jnp.float32))
            lq = jax.nn.log_softmax(prior["logit"].astype(jnp.float32))
            p = jnp.exp(lp)
            return jnp.sum(p * (lp - lq), axis=(-2, -1))
        mp, sp = (post["mean"].astype(jnp.float32),
                  post["std"].astype(jnp.float32))
        mq, sq = (prior["mean"].astype(jnp.float32),
                  prior["std"].astype(jnp.float32))
        kl = (jnp.log(sq / sp) + (sp**2 + (mp - mq) ** 2) / (2 * sq**2)
              - 0.5)
        return jnp.sum(kl, -1)

    def kl_loss(self, post: State, prior: State, forward: bool = False,
                balance: float = 0.8, free: float = 1.0,
                scale: float = 1.0):
        """Balanced KL with free bits (reference networks.py:172-189)."""
        sg = lambda s: jax.tree_util.tree_map(jax.lax.stop_gradient, s)
        lhs, rhs = (prior, post) if forward else (post, prior)
        mix = balance if forward else (1.0 - balance)
        value = self._logprob_and_kl(lhs, rhs)
        if balance == 0.5:
            loss = jnp.mean(jnp.maximum(value, free))
        else:
            loss_lhs = jnp.maximum(
                jnp.mean(self._logprob_and_kl(lhs, sg(rhs))), free)
            loss_rhs = jnp.maximum(
                jnp.mean(self._logprob_and_kl(sg(lhs), rhs)), free)
            loss = mix * loss_lhs + (1.0 - mix) * loss_rhs
        return loss * scale, value

