"""LR schedules and early stopping.

Capability parity with the scheduling layer spread across the reference:
  * ReduceLROnPlateau + early stopping from the ConvLSTM sub-repo
    (/root/reference/ConvLSTM-PyTorch/earlystopping.py:6-51, main.py);
  * the Vid-ODE GAN loop's 0.99-per-epoch exponential decay
    (/root/reference/Vid-ODE/main.py:214-215);
  * the main driver's update_learning_rate floor
    (/root/reference/helpers/utils.py:148-152).

Implemented as optax-composable transforms and a host-side EarlyStopping
helper (the plateau logic is host-side state, like the reference's).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import optax


def exponential_epoch_decay(base_lr: float, decay: float = 0.99,
                            steps_per_epoch: int = 1,
                            lowest: float = 0.0):
    """lr(step) = max(base·decay^epoch, lowest) — the Vid-ODE GAN decay
    (and helpers/utils.update_learning_rate with a floor)."""

    def schedule(step):
        import jax.numpy as jnp
        epoch = step // steps_per_epoch
        return jnp.maximum(base_lr * decay ** epoch, lowest)

    return schedule


class ReduceLROnPlateau:
    """Host-side plateau detector: returns the current LR scale factor.

    Mirrors torch's ReduceLROnPlateau semantics the ConvLSTM baseline
    uses (factor, patience, min_lr)."""

    def __init__(self, factor: float = 0.5, patience: int = 4,
                 min_scale: float = 1e-3):
        self.factor = factor
        self.patience = patience
        self.min_scale = min_scale
        self.best = np.inf
        self.bad_epochs = 0
        self.scale = 1.0

    def step(self, metric: float) -> float:
        if metric < self.best - 1e-12:
            self.best = metric
            self.bad_epochs = 0
        else:
            self.bad_epochs += 1
            if self.bad_epochs > self.patience:
                self.scale = max(self.scale * self.factor, self.min_scale)
                self.bad_epochs = 0
        return self.scale


class EarlyStopping:
    """Stop when the validation metric hasn't improved for `patience`
    epochs (ConvLSTM-PyTorch earlystopping.py semantics; the checkpoint
    side is handled by CheckpointManager)."""

    def __init__(self, patience: int = 10, min_delta: float = 0.0):
        self.patience = patience
        self.min_delta = min_delta
        self.best: Optional[float] = None
        self.counter = 0
        self.should_stop = False

    def step(self, metric: float) -> bool:
        if self.best is None or metric < self.best - self.min_delta:
            self.best = metric
            self.counter = 0
        else:
            self.counter += 1
            if self.counter >= self.patience:
                self.should_stop = True
        return self.should_stop


def scaled_by_schedule(tx: optax.GradientTransformation, schedule):
    """Wrap an optimizer with a multiplicative step-indexed LR schedule."""
    return optax.chain(tx, optax.scale_by_schedule(
        lambda step: schedule(step)))


def set_lr_scale(state, scale: float):
    """Write a new plateau LR scale into a TrainState whose optimizer was
    built with ``lr_scheduler: plateau`` (the trailing
    ``inject_hyperparams(scale)`` element of the optax chain).

    Pure host-side pytree surgery — the jitted step just sees a different
    ``step_size`` value, so nothing recompiles. Keeps the leaf's sharding
    when it has one (mesh runs)."""
    import jax
    import jax.numpy as jnp

    new_elems = []
    found = False
    for elem in state.opt_state:
        hp = getattr(elem, "hyperparams", None)
        if not found and isinstance(hp, dict) and "step_size" in hp:
            old = hp["step_size"]
            new = jnp.asarray(scale, dtype=getattr(old, "dtype", jnp.float32))
            sharding = getattr(old, "sharding", None)
            if sharding is not None:
                new = jax.device_put(new, sharding)
            elem = elem._replace(hyperparams={**hp, "step_size": new})
            found = True
        new_elems.append(elem)
    if not found:
        raise ValueError(
            "set_lr_scale: no inject_hyperparams(scale) element in "
            "opt_state — was the optimizer built with lr_scheduler: "
            "plateau?")
    return state.replace(opt_state=tuple(new_elems))
