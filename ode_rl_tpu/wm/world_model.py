"""Dreamer world model for video prediction.

Capability parity with /root/reference/dreamerv2/models.py:8-103 (the
world-model-only training mode the reference actually runs — its
actor-critic is commented out): ConvEncoder → RSSM observe → image (and
optional discount) heads with log-likelihood losses + balanced KL with
scheduled balance/free/scale; ``video_pred`` open-loop rollout
diagnostics (:88-103); Adam with eps/clip/weight-decay matching
tools.Optimizer (:554-623 — loss scaling is unnecessary under bf16).

The reference's ``@tf.function``-compiled ``_train`` (dreamer.py:103-117)
is the one place it compiles a whole step; here that is simply the same
jitted-step shape as every other model in this framework.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax

from ode_rl_tpu.wm.networks import ConvDecoder, ConvEncoder, DenseHead
from ode_rl_tpu.wm.rssm import RSSM
from ode_rl_tpu.wm.tools import schedule


class WorldModel(nn.Module):
    image_shape: Tuple[int, int, int] = (64, 64, 1)
    cnn_depth: int = 32
    stoch: int = 30
    deter: int = 200
    hidden: int = 200
    discrete: int = 0
    mean_act: str = "none"
    std_act: str = "sigmoid2"   # reference dv2 default (configs.yaml:43)
    min_std: float = 0.1
    cell_norm: bool = True      # dyn_cell: gru_layer_norm (mmnist recipe)
    kl_balance: Any = 0.8
    kl_free: Any = 1.0
    kl_scale: Any = 1.0
    kl_forward: bool = False
    pred_discount: bool = False
    discount_scale: float = 1.0
    pred_reward: bool = False
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = ConvEncoder(depth=self.cnn_depth, dtype=self.dtype,
                                   param_dtype=self.param_dtype)
        self.dynamics = RSSM(stoch=self.stoch, deter=self.deter,
                             hidden=self.hidden, discrete=self.discrete,
                             mean_act=self.mean_act, std_act=self.std_act,
                             min_std=self.min_std, cell_norm=self.cell_norm,
                             dtype=self.dtype, param_dtype=self.param_dtype)
        self.image_head = ConvDecoder(depth=self.cnn_depth,
                                      shape=self.image_shape,
                                      dtype=self.dtype,
                                      param_dtype=self.param_dtype)
        if self.pred_discount:
            self.discount_head = DenseHead(shape=(), layers=4, units=400,
                                           dist="binary", dtype=self.dtype,
                                           param_dtype=self.param_dtype)
        if self.pred_reward:
            # The reference RL world model always carries heads['reward']
            # (dreamerv2/models.py:28-30); the action-free video models
            # here keep it off.
            self.reward_head = DenseHead(shape=(), layers=4, units=400,
                                         dtype=self.dtype,
                                         param_dtype=self.param_dtype)

    # ------------------------------------------------------------------
    def loss(self, batch: Dict, train: bool = True, step: int = 0,
             return_features: bool = False):
        """batch['image']: (B, T, H, W, C) in [-0.5, 0.5].

        ``return_features=True`` adds the posterior features to the
        metrics under ``"_features"`` (consumed by the CATER classifier
        path, which otherwise would re-run the encoder+observe)."""
        image = batch["image"].astype(self.dtype)
        key = self.make_rng("sample")
        embed = self.encoder(image)
        post, prior = self.dynamics.observe(embed, key,
                                            actions=batch.get("action"))

        kl_balance = schedule(self.kl_balance, step)
        kl_free = schedule(self.kl_free, step)
        kl_scale = schedule(self.kl_scale, step)
        # Schedules may be traced; use the static balance for branch
        # selection when it is a plain float (the common case).
        balance = (self.kl_balance if isinstance(self.kl_balance, float)
                   else 0.8)
        kl_loss, kl_value = self.dynamics.kl_loss(
            post, prior, self.kl_forward, balance, kl_free, kl_scale)

        feat = self.dynamics.get_feat(post)
        mean = self.image_head(feat)
        img_lp = jnp.sum(
            -0.5 * (jnp.log(2 * jnp.pi)
                    + (mean.astype(jnp.float32)
                       - image.astype(jnp.float32)) ** 2),
            axis=(-3, -2, -1))
        losses = {"image": -jnp.mean(img_lp)}
        if self.pred_discount and "discount" in batch:
            dmean = self.discount_head(feat)
            dlp = self.discount_head.log_prob(dmean, batch["discount"])
            losses["discount"] = -jnp.mean(dlp) * self.discount_scale
        if self.pred_reward and "reward" in batch:
            rmean = self.reward_head(feat)
            rlp = self.reward_head.log_prob(rmean, batch["reward"])
            losses["reward"] = -jnp.mean(rlp)

        model_loss = sum(losses.values()) + kl_loss
        metrics = {
            "loss": model_loss, "kl_loss": kl_loss,
            "kl": jnp.mean(kl_value),
            "prior_ent": jnp.mean(self.dynamics.entropy(prior)),
            "post_ent": jnp.mean(self.dynamics.entropy(post)),
            "kl_free": kl_free, "kl_scale": kl_scale,
            **{f"{k}_loss": v for k, v in losses.items()},
        }
        pred = mean.astype(jnp.float32)
        if return_features:
            metrics["_features"] = feat
        return model_loss, (metrics, pred)

    # ------------------------------------------------------------------
    def observe_features(self, image: jnp.ndarray) -> jnp.ndarray:
        """(B, T, H, W, C) in [-0.5, 0.5] → (B, T, F) posterior features
        (the classifier's input, reference models.py:action_pred)."""
        embed = self.encoder(image.astype(self.dtype))
        post, _ = self.dynamics.observe(embed, self.make_rng("sample"))
        return self.dynamics.get_feat(post)

    # ------------------------------------------------------------------
    def video_pred(self, batch: Dict, initial_frames: int = 10):
        """Open-loop rollout diagnostics (reference models.py:88-103):
        condition on the first ``initial_frames``, imagine the rest."""
        image = batch["image"].astype(self.dtype)
        b, t = image.shape[:2]
        initial_frames = min(initial_frames, t - 1)
        key = self.make_rng("sample")
        k1, k2 = jax.random.split(key)
        embed = self.encoder(image)
        post, _ = self.dynamics.observe(embed, k1)
        recon = self.image_head(self.dynamics.get_feat(post))
        init = jax.tree_util.tree_map(
            lambda v: v[:, initial_frames - 1], post)
        prior = self.dynamics.imagine(t - initial_frames, init, k2)
        openl = self.image_head(self.dynamics.get_feat(prior))
        imagined = jnp.concatenate(
            [recon[:, :initial_frames], openl], axis=1)
        return {
            "truth": image.astype(jnp.float32) + 0.5,
            "recon": recon.astype(jnp.float32) + 0.5,
            "imagined": imagined.astype(jnp.float32) + 0.5,
        }

    # API-parity aliases with the rest of the model zoo.
    def predict(self, batch: Dict, train: bool = False):
        _, (metrics, pred) = self.loss(batch, train=train)
        return pred + 0.5, {k: v for k, v in metrics.items()
                            if k not in ("loss",)}


class DreamerVideoModel(WorldModel):
    """Adapter exposing the framework's uniform predict/loss API so the
    Dreamer world model trains through the same CLI as every other model
    (the reference runs it via its own dreamer.py entry; the capability —
    world-model video prediction — is identical). The full sequence
    (observed + to-predict) is the training episode, mirroring the
    reference's break_batch episode chunks."""

    initial_frames: int = 10

    def loss(self, batch: Dict, train: bool = True, step: int = 0):
        if "image" not in batch:
            video = jnp.concatenate(
                [batch["observed_data"], batch["data_to_predict"]], axis=1)
            batch = {"image": video}
        return WorldModel.loss(self, batch, train=train, step=step)

    def predict(self, batch: Dict, train: bool = False):
        """Open-loop prediction of the to-predict frames (in [0, 1])."""
        n_in = batch["observed_data"].shape[1]
        video = jnp.concatenate(
            [batch["observed_data"], batch["data_to_predict"]], axis=1)
        out = self.video_pred({"image": video}, initial_frames=n_in)
        return out["imagined"][:, n_in:], {}


def world_model_optimizer(lr: float = 3e-4, eps: float = 1e-5,
                          clip: float = 100.0, wd: float = 1e-6
                          ) -> optax.GradientTransformation:
    """tools.Optimizer equivalence: Adam(eps) + global-norm clip +
    decoupled weight decay (loss scaling is a no-op under bf16)."""
    return optax.chain(
        optax.clip_by_global_norm(clip),
        optax.adamw(lr, eps=eps, weight_decay=wd),
    )
