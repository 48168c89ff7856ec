"""Jitted train/eval steps.

Capability parity with the reference driver
(/root/reference/train_test.py:169-207): Adam, optional global-norm grad
clipping (``clip != -1``), grad-norm telemetry, MSE training loss; eval
computes per-horizon MSE/PSNR/SSIM.

TPU-first: one XLA program per step — forward, backward, clip, update,
metric computation all fused under ``jax.jit``; gradient all-reduce over
the 'data' mesh axis is inserted by XLA from sharding annotations. The
reference leaves ``torch.autograd.set_detect_anomaly(True)`` on globally;
the equivalent here is the opt-in ``debug_nans`` config flag.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict

from ode_rl_tpu.train.metrics import per_frame_metrics


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1, params=new_params, opt_state=new_opt_state)


def make_optimizer(cfg) -> optax.GradientTransformation:
    """Adam (reference train_test.py:24) with optional global-norm clip
    (reference train_test.py:187-188; clip == -1 disables)."""
    chain = []
    clip = float(cfg.get("clip", -1))
    if clip != -1:
        chain.append(optax.clip_by_global_norm(clip))
    opt_name = cfg.get("optimizer", "adam")
    lr = float(cfg.lr)
    if opt_name == "adam":
        chain.append(optax.adam(lr))
    elif opt_name == "adamax":  # Vid-ODE's GAN loop uses Adamax
        chain.append(optax.adamax(lr))
    else:
        raise NotImplementedError(f"optimizer {opt_name!r}")
    return optax.chain(*chain)


def create_train_state(model, cfg, sample_batch, rng) -> TrainState:
    params = model.init(rng, sample_batch, train=True, method=model.loss)
    tx = make_optimizer(cfg)
    return TrainState(
        step=jnp.asarray(0, jnp.int32),
        params=params,
        opt_state=tx.init(params),
        tx=tx,
    )


def make_train_step(model, donate: bool = True) -> Callable:
    """Returns jitted (state, batch, rng) → (state, metrics)."""

    def train_step(state: TrainState, batch: Dict, rng) -> Tuple[TrainState, Dict]:
        def loss_fn(params):
            loss, (metrics, _pred) = model.apply(
                params, batch, train=True, method=model.loss,
                rngs={"sample": rng} if rng is not None else {},
            )
            return loss, metrics

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        metrics["grad_norm"] = optax.global_norm(grads)
        new_state = state.apply_gradients(grads)
        return new_state, metrics

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def make_eval_step(model) -> Callable:
    """Returns jitted (params, batch) → per-horizon metrics + pred."""

    def eval_step(params, batch):
        pred, aux = model.apply(params, batch, train=False,
                                method=model.predict)
        target = batch["data_to_predict"].astype(jnp.float32) + 0.5
        # S3VAE-family models reconstruct the full sequence; compare the
        # matching tail (the reference compares against in+out concat).
        if pred.shape[1] != target.shape[1]:
            obs = batch["observed_data"].astype(jnp.float32) + 0.5
            target = jnp.concatenate([obs, target], axis=1)
        metrics = per_frame_metrics(pred, target)
        metrics = {**metrics, **{f"aux_{k}": v for k, v in aux.items()}}
        return metrics, pred

    return jax.jit(eval_step)
