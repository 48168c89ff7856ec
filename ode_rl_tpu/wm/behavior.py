"""Imagined-rollout actor-critic (DreamerV2's ImagBehavior), live.

The reference ships this module only as dead code — the entire
``ImagBehavior`` class is commented out
(/root/reference/dreamerv2/models.py:198-360) and its configs
(imag_horizon, actor_*, value_*, slow_*) sit unused in
dreamerv2/configs.yaml:51-103. This is the working TPU-native
implementation of that design:

  * actor + value heads over RSSM features (ActionHead: one-hot
    straight-through categorical or tanh-Gaussian, the reference's
    'onehot'/'trunc_normal' families);
  * imagined rollouts through the action-conditioned RSSM prior as one
    ``lax.scan`` (the reference's tools.static_scan python loop,
    models.py:223-249);
  * λ-return targets with a slow value target (hard copy every
    ``slow_target_update`` steps, the slow_target_fraction=1 default),
    discount-weight cumprod (models.py:252-274);
  * actor losses: 'dynamics' (backprop through the rollout — the
    straight-through latent samples carry the gradient), 'reinforce'
    (score-function with value baseline), or 'both'
    (models.py:276-300), plus the entropy bonus;
  * value regression to the stopped λ-target (models.py:209-214).

Functional style to match the rest of the package: the behavior owns
only actor/value/slow-value params; the world model enters through
``img_step_fn(state, key, action) -> state`` / ``get_feat_fn(state)``
closures over its (frozen) params, and rewards through
``reward_fn(feat, state, action)``.
"""

from __future__ import annotations

import functools
from typing import Callable, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn

from ode_rl_tpu.wm.networks import DenseHead, _act
from ode_rl_tpu.wm.tools import lambda_return, one_hot_st_sample


class ActionHead(nn.Module):
    """Policy head (reference networks.ActionHead): MLP → action dist.

    dist='onehot': straight-through categorical (discrete control);
    dist='tanh_normal': tanh-squashed Gaussian with learned std
    (the reference's trunc_normal family squashes to [-1, 1] too).
    """

    action_dim: int
    layers: int = 4
    units: int = 400
    act: str = "elu"
    dist: str = "onehot"
    init_std: float = 1.0
    min_std: float = 0.1
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, features: jnp.ndarray) -> jnp.ndarray:
        """Features → distribution stats: logits (onehot) or
        concat[mean, raw_std] (tanh_normal)."""
        act = _act(self.act)
        x = features.astype(self.dtype)
        for i in range(self.layers):
            x = act(nn.Dense(self.units, dtype=self.dtype,
                             param_dtype=self.param_dtype,
                             name=f"h{i}")(x))
        width = (self.action_dim if self.dist == "onehot"
                 else 2 * self.action_dim)
        return nn.Dense(width, dtype=self.dtype,
                        param_dtype=self.param_dtype, name="out")(x)

    # --- distribution ops over the stats (fp32, jit-safe) --------------
    def _split(self, stats):
        stats = stats.astype(jnp.float32)
        if self.dist == "onehot":
            return stats
        mean, raw = jnp.split(stats, 2, axis=-1)
        # reference: std = 2·sigmoid((raw + init)/2) + min_std
        raw_init = jnp.log(jnp.exp(self.init_std) - 1.0)
        std = 2.0 * jax.nn.sigmoid((raw + raw_init) / 2.0) + self.min_std
        return mean, std

    def sample(self, stats, key):
        if self.dist == "onehot":
            return one_hot_st_sample(key, self._split(stats))
        mean, std = self._split(stats)
        eps = jax.random.normal(key, mean.shape, jnp.float32)
        return jnp.tanh(mean + std * eps)

    def mode(self, stats):
        if self.dist == "onehot":
            logits = self._split(stats)
            return jax.nn.one_hot(jnp.argmax(logits, -1), self.action_dim,
                                  dtype=jnp.float32)
        mean, _ = self._split(stats)
        return jnp.tanh(mean)

    def log_prob(self, stats, action):
        if self.dist == "onehot":
            lp = jax.nn.log_softmax(self._split(stats))
            return jnp.sum(lp * jax.lax.stop_gradient(action), -1)
        # tanh-Gaussian with change of variables
        mean, std = self._split(stats)
        a = jnp.clip(action, -0.999, 0.999)
        pre = jnp.arctanh(a)
        base = (-0.5 * ((pre - mean) / std) ** 2
                - jnp.log(std) - 0.5 * jnp.log(2.0 * jnp.pi))
        jac = jnp.log1p(-a * a)
        return jnp.sum(base - jac, -1)

    def entropy(self, stats):
        if self.dist == "onehot":
            lp = jax.nn.log_softmax(self._split(stats))
            return -jnp.sum(jnp.exp(lp) * lp, -1)
        _, std = self._split(stats)
        # base-Gaussian entropy (the tanh correction has no closed form;
        # the reference's trunc-normal entropy is likewise approximate)
        return jnp.sum(0.5 * jnp.log(2.0 * jnp.pi * jnp.e * std * std), -1)


class BehaviorState(NamedTuple):
    actor_params: Dict
    value_params: Dict
    slow_value_params: Dict
    actor_opt: optax.OptState
    value_opt: optax.OptState
    updates: jnp.ndarray      # int32 step counter for the slow target


class ImagBehavior:
    """Actor-critic trained inside the world model's imagination."""

    def __init__(self, action_dim: int, feat_dim: int,
                 actor_dist: str = "onehot", horizon: int = 15,
                 discount: float = 0.99, discount_lambda: float = 0.95,
                 actor_lr: float = 8e-5, value_lr: float = 8e-5,
                 actor_grad_clip: float = 100.0,
                 value_grad_clip: float = 100.0,
                 actor_entropy: float = 1e-4,
                 imag_gradient: str = "dynamics",
                 slow_target_update: int = 100,
                 units: int = 400, layers: int = 4,
                 stop_grad_actor: bool = True):
        self.actor = ActionHead(action_dim=action_dim, dist=actor_dist,
                                units=units, layers=layers)
        self.value = DenseHead(shape=(), layers=layers, units=units)
        self.horizon = horizon
        self.discount = discount
        self.discount_lambda = discount_lambda
        self.actor_entropy = actor_entropy
        self.imag_gradient = imag_gradient
        self.slow_target_update = slow_target_update
        self.stop_grad_actor = stop_grad_actor
        self.feat_dim = feat_dim
        self._actor_tx = optax.chain(
            optax.clip_by_global_norm(actor_grad_clip),
            optax.adam(actor_lr, eps=1e-5))
        self._value_tx = optax.chain(
            optax.clip_by_global_norm(value_grad_clip),
            optax.adam(value_lr, eps=1e-5))

    # ------------------------------------------------------------------
    def init(self, key) -> BehaviorState:
        k1, k2 = jax.random.split(key)
        feat = jnp.zeros((1, self.feat_dim))
        actor_params = self.actor.init(k1, feat)
        value_params = self.value.init(k2, feat)
        return BehaviorState(
            actor_params=actor_params, value_params=value_params,
            slow_value_params=jax.tree_util.tree_map(jnp.copy, value_params),
            actor_opt=self._actor_tx.init(actor_params),
            value_opt=self._value_tx.init(value_params),
            updates=jnp.zeros((), jnp.int32))

    # ------------------------------------------------------------------
    def imagine(self, actor_params, start_state, img_step_fn: Callable,
                get_feat_fn: Callable, key
                ) -> Tuple[jnp.ndarray, Dict, jnp.ndarray]:
        """Policy rollout through the prior: (H+1, B, F) feats,
        (H+1, B, ...) states, (H+1, B, A) actions (reference _imagine,
        models.py:223-249 — one lax.scan instead of static_scan)."""

        def step(carry, k):
            state = carry
            feat = get_feat_fn(state)
            inp = (jax.lax.stop_gradient(feat) if self.stop_grad_actor
                   else feat)
            ka, kd = jax.random.split(k)
            stats = self.actor.apply(actor_params, inp)
            action = self.actor.sample(stats, ka)
            succ = img_step_fn(state, kd, action)
            return succ, (state, feat, action)

        keys = jax.random.split(key, self.horizon)
        _, (states, feats, actions) = jax.lax.scan(step, start_state, keys)
        return feats, states, actions

    # ------------------------------------------------------------------
    def _compute_target(self, value_params, slow_params, feats, reward):
        value = self.value.apply(slow_params, feats)
        discount = self.discount * jnp.ones_like(reward)
        target = lambda_return(reward[:-1], value[:-1], discount[:-1],
                               bootstrap=value[-1],
                               lambda_=self.discount_lambda, axis=0)
        weights = jax.lax.stop_gradient(jnp.cumprod(jnp.concatenate(
            [jnp.ones_like(discount[:1]), discount[:-1]], 0), 0))
        return target, weights

    # ------------------------------------------------------------------
    def loss(self, actor_params, value_params, slow_params, start_state,
             img_step_fn, get_feat_fn, reward_fn, key):
        feats, states, actions = self.imagine(
            actor_params, start_state, img_step_fn, get_feat_fn, key)
        reward = reward_fn(feats, states, actions).astype(jnp.float32)
        stats = self.actor.apply(
            actor_params,
            jax.lax.stop_gradient(feats) if self.stop_grad_actor else feats)
        ent = self.actor.entropy(stats)
        target, weights = self._compute_target(
            value_params, slow_params, feats, reward)

        if self.imag_gradient == "dynamics":
            actor_target = target
        elif self.imag_gradient == "reinforce":
            baseline = self.value.apply(value_params, feats[:-1])
            adv = jax.lax.stop_gradient(target - baseline)
            actor_target = self.actor.log_prob(
                stats, jax.lax.stop_gradient(actions))[:-1] * adv
        elif self.imag_gradient == "both":
            baseline = self.value.apply(value_params, feats[:-1])
            adv = jax.lax.stop_gradient(target - baseline)
            reinforce = self.actor.log_prob(
                stats, jax.lax.stop_gradient(actions))[:-1] * adv
            actor_target = 0.5 * target + 0.5 * reinforce
        else:
            raise NotImplementedError(self.imag_gradient)
        actor_target = actor_target + self.actor_entropy * ent[:-1]
        actor_loss = -jnp.mean(weights[:-1] * actor_target)

        value_pred = self.value.apply(value_params, feats[:-1])
        value_loss = jnp.mean(
            weights[:-1] * (value_pred - jax.lax.stop_gradient(target)) ** 2)
        metrics = {"actor_loss": actor_loss, "value_loss": value_loss,
                   "reward_mean": jnp.mean(reward),
                   "actor_ent": jnp.mean(ent),
                   "target_mean": jnp.mean(target)}
        return actor_loss, value_loss, metrics

    # ------------------------------------------------------------------
    def make_train_step(self, img_step_fn, get_feat_fn, reward_fn):
        """One jitted update of actor + value from imagined rollouts."""

        @jax.jit
        def train_step(state: BehaviorState, start_state, key):
            k1, k2 = jax.random.split(key)

            def actor_loss_fn(ap):
                al, _, m = self.loss(ap, state.value_params,
                                     state.slow_value_params, start_state,
                                     img_step_fn, get_feat_fn, reward_fn, k1)
                return al, m

            (_, metrics), a_grads = jax.value_and_grad(
                actor_loss_fn, has_aux=True)(state.actor_params)
            a_up, a_opt = self._actor_tx.update(
                a_grads, state.actor_opt, state.actor_params)
            actor_params = optax.apply_updates(state.actor_params, a_up)

            def value_loss_fn(vp):
                _, vl, _ = self.loss(actor_params, vp,
                                     state.slow_value_params, start_state,
                                     img_step_fn, get_feat_fn, reward_fn, k2)
                return vl

            vl, v_grads = jax.value_and_grad(value_loss_fn)(
                state.value_params)
            v_up, v_opt = self._value_tx.update(
                v_grads, state.value_opt, state.value_params)
            value_params = optax.apply_updates(state.value_params, v_up)

            updates = state.updates + 1
            copy = (updates % self.slow_target_update) == 0
            slow = jax.tree_util.tree_map(
                lambda s, v: jnp.where(copy, v, s),
                state.slow_value_params, value_params)
            return BehaviorState(actor_params, value_params, slow,
                                 a_opt, v_opt, updates), metrics

        return train_step


def rssm_behavior_fns(rssm, rssm_params) -> Tuple[Callable, Callable]:
    """(img_step_fn, get_feat_fn) closures over a trained RSSM — the glue
    between a WorldModel's dynamics and ImagBehavior."""

    def img_step_fn(state, key, action):
        return rssm.apply(rssm_params, state, key, action=action,
                          method=rssm.img_step)

    def get_feat_fn(state):
        return rssm.apply(rssm_params, state, method=rssm.get_feat)

    return img_step_fn, get_feat_fn
