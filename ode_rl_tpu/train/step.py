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

State layout: ``params`` is the trainable 'params' collection;
``model_state`` carries non-trainable collections (BatchNorm running
stats for the S3VAE-family encoders — the reference's BatchNorm2d
modules at /root/reference/modules/S3VAE_ED.py:20-43).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    model_state: Any          # non-trainable collections (batch_stats, …)
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1, params=new_params, opt_state=new_opt_state)

    @property
    def variables(self) -> Dict:
        return {"params": self.params, **self.model_state}


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
    elif opt_name == "adamax":  # Vid-ODE's GAN loop + ConvLSTM use Adamax
        chain.append(optax.adamax(lr))
    else:
        raise NotImplementedError(f"optimizer {opt_name!r}")
    if cfg.get("lr_scheduler", "") == "plateau":
        # Host-controlled LR scale for ReduceLROnPlateau (ConvLSTM
        # sub-repo capability, reference ConvLSTM-PyTorch/main.py:21-24 +
        # earlystopping.py): the scale lives in opt_state.hyperparams so
        # the epoch loop can update it without recompiling the step.
        chain.append(optax.inject_hyperparams(optax.scale)(step_size=1.0))
    return optax.chain(*chain)


def create_train_state(model, cfg, sample_batch, rng) -> TrainState:
    init_rng, sample_rng, drop_rng = jax.random.split(rng, 3)
    variables = model.init(
        {"params": init_rng, "sample": sample_rng, "dropout": drop_rng},
        sample_batch, train=True, method=model.loss)
    params = variables["params"]
    model_state = {k: v for k, v in variables.items() if k != "params"}
    tx = make_optimizer(cfg)
    return TrainState(
        step=jnp.asarray(0, jnp.int32),
        params=params,
        model_state=model_state,
        opt_state=tx.init(params),
        tx=tx,
    )


def _train_step_fn(model, nan_guard: bool = False) -> Callable:
    """Raw (unjitted) train step for composition into larger programs."""

    def train_step(state: TrainState, batch: Dict, rng) -> Tuple[TrainState, Dict]:
        mutable = list(state.model_state.keys())

        def loss_fn(params):
            out = model.apply(
                {"params": params, **state.model_state}, batch, train=True,
                method=model.loss, mutable=mutable,
                rngs=({"sample": rng, "dropout": jax.random.fold_in(rng, 7)}
                      if rng is not None else {}))
            (loss, (metrics, _pred)), new_model_state = out
            return loss, (metrics, new_model_state)

        (loss, (metrics, new_model_state)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        metrics["grad_norm"] = optax.global_norm(grads)
        new_state = state.apply_gradients(grads).replace(
            model_state=new_model_state)
        if nan_guard:
            # Skip non-finite updates instead of poisoning the params
            # (SURVEY §5.3 elastic-recovery guard).
            from ode_rl_tpu.core.debug import nan_guard_update
            guarded, skipped = nan_guard_update(
                state.params, new_state.params, grads)
            new_state = new_state.replace(params=guarded)
            metrics["nan_skipped"] = skipped
        return new_state, metrics

    return train_step


def make_train_step(model, donate: bool = True,
                    nan_guard: bool = False) -> Callable:
    """Returns jitted (state, batch, rng) → (state, metrics)."""
    return jax.jit(_train_step_fn(model, nan_guard=nan_guard),
                   donate_argnums=(0,) if donate else ())


def make_fused_train_step(model, cfg, sprite_bank, mesh=None,
                          flow_label_fn=None) -> Callable:
    """Train step with the Moving MNIST generator fused INTO the jitted
    program: (state, key) → (state, metrics, next_key).

    One host→device dispatch per step — data generation, key handling,
    forward, backward, and the update all compile into a single XLA
    program. This matters doubly here because device dispatches traverse
    a network tunnel (axon); the reference instead burns host CPU in
    cv2/DataLoader workers (SURVEY L3).
    """
    from ode_rl_tpu.data.mmnist import generate_moving_mnist
    from ode_rl_tpu.data.protocol import make_batch_dict

    n_in = int(cfg.train_in_seq)
    n_out = int(cfg.train_out_seq)
    batch_size = int(cfg.batch_size)
    num_digits = int(cfg.num_digits)
    with_flow = cfg.model in ("S3VAE",)
    base_step = _train_step_fn(model, nan_guard=cfg.get("nan_guard", False))

    def fused_step(state: TrainState, key) -> Tuple[TrainState, Dict, Any]:
        key_data, key_model, key_next = jax.random.split(key, 3)
        video = generate_moving_mnist(
            key_data, sprite_bank, batch=batch_size,
            n_frames=n_in + n_out, num_digits=num_digits)
        if mesh is not None:
            # Shard the generated batch over the 'data' axis right at the
            # source so the whole step runs SPMD.
            from jax.sharding import NamedSharding, PartitionSpec as P
            video = jax.lax.with_sharding_constraint(
                video, NamedSharding(mesh, P("data")))
        batch = make_batch_dict(video, n_in=n_in, with_flow_labels=with_flow,
                                flow_label_fn=flow_label_fn)
        new_state, metrics = base_step(state, batch, key_model)
        return new_state, metrics, key_next

    return jax.jit(fused_step, donate_argnums=(0,))


def make_eval_step(model) -> Callable:
    """Returns jitted (variables, batch, rng) → per-horizon metrics + pred."""
    from ode_rl_tpu.train.metrics import per_frame_metrics

    def eval_step(variables, batch, rng=None):
        pred, aux = model.apply(variables, batch, train=False,
                                method=model.predict,
                                rngs={"sample": rng} if rng is not None else {})
        target = batch["data_to_predict"].astype(jnp.float32) + 0.5
        # S3VAE-family models reconstruct the full sequence; compare the
        # matching tail (the reference compares against in+out concat).
        if pred.shape[1] != target.shape[1]:
            obs = batch["observed_data"].astype(jnp.float32) + 0.5
            target = jnp.concatenate([obs, target], axis=1)
        metrics = per_frame_metrics(pred, target)
        metrics = {**metrics, **{f"aux_{k}": v for k, v in aux.items()
                                 if not k.startswith("_")}}
        return metrics, pred

    return jax.jit(eval_step)
