"""Optical-flow training driver.

Capability parity with /root/reference/flownet2-pytorch/main.py: train /
validate / inference loops over flow datasets with the MultiScale loss.
The reference's FlyingChairs/FlyingThings data is not in this image, so
the default dataset is a synthetic random-warp generator: a frame from
the Moving MNIST generator plus a smooth random flow field and its
``resample2d`` warp — ground-truth flow for free, fully on device (the
same supervision structure as the chairs data). Real datasets plug in by
swapping the batch iterator. The reference's fp16 + fp32-copy trick
(main.py:200-207) is simply bf16 compute / fp32 params here.
"""

from __future__ import annotations

import functools
from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from ode_rl_tpu.data.mmnist import generate_moving_mnist
from ode_rl_tpu.data.sprites import get_sprite_bank
from ode_rl_tpu.flow.losses import epe, multiscale_loss
from ode_rl_tpu.ops.warp import resample2d


@functools.partial(jax.jit, static_argnames=("batch", "size", "style"))
def synthetic_flow_batch(key, sprite_bank, batch: int = 8, size: int = 64,
                         style: str = "digits"
                         ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(img1, img2, flow) supervision triplets, ground truth exact.

    ``style='digits'`` (default since round 5): render TWO REAL frames
    of 3 moving digits and label each pixel with the motion of the digit
    in front of it (forward flow on frame 1: img2(p + flow(p)) =
    img1(p) on digit pixels; 0 on background). This is both the
    FlyingChairs statistics (piecewise-constant object flow over a
    static background with real discontinuities — the reference's
    training distribution, flownet2-pytorch datasets.py) and the DFP
    downstream task's own distribution (digit motion IS per-digit
    translation), AND it removes the resample2d warp from datagen —
    measured 8.9 ms of the 10 ms generator at batch 256 (the one-hot
    interpolation is B·(HW)²·C work when the field varies per pixel).

    ``style='smooth'`` keeps the pre-r5 generator (coarse-noise bicubic
    field + backward warp) for continuity with earlier EPE artifacts.
    """
    if style == "smooth":
        k1, k2 = jax.random.split(key)
        video = generate_moving_mnist(k1, sprite_bank, batch=batch,
                                      n_frames=1, num_digits=3) + 0.5
        img1 = jnp.repeat(video[:, 0], 3, axis=-1)     # (B, H, W, 3)
        coarse = jax.random.normal(k2, (batch, 4, 4, 2)) * 3.0
        flow = jax.image.resize(coarse, (batch, size, size, 2), "bicubic")
        img2 = resample2d(img1, flow)
        return img1, img2, flow

    from ode_rl_tpu.data.mmnist import generate_moving_mnist_per_digit

    per, _idx, pos = generate_moving_mnist_per_digit(
        key, sprite_bank, batch=batch, n_frames=2, num_digits=3)
    # per: (B, D, 2, H, W) in [0, 255]; pos: (B, D, 2, 2) int (y, x).
    comp = jnp.max(per, axis=1) / 255.0                # (B, 2, H, W)
    img1 = jnp.repeat(comp[:, 0, :, :, None], 3, axis=-1)
    img2 = jnp.repeat(comp[:, 1, :, :, None], 3, axis=-1)
    inten1 = per[:, :, 0]                              # (B, D, H, W)
    front = jax.nn.one_hot(jnp.argmax(inten1, axis=1), per.shape[1],
                           axis=1)                     # (B, D, H, W)
    occupied = (jnp.max(inten1, axis=1) > 0.0)[..., None]
    delta = (pos[:, :, 1] - pos[:, :, 0]).astype(jnp.float32)  # (B,D,2) dy,dx
    dsel = jnp.einsum("bdhw,bdc->bhwc", front, delta)  # (B, H, W, [dy,dx])
    flow = jnp.where(occupied, dsel[..., ::-1], 0.0)   # (dx, dy) channels
    return img1, img2, flow


def make_flow_train_step(model, lr: float = 1e-4, loss_norm: str = "l1",
                         single_scale: bool = False
                         ) -> Tuple[Callable, Callable]:
    """Returns (init_fn, step_fn) for a flow net. Pyramid-output nets
    (FlowNetS/C/SD) train with the MultiScale loss; ``single_scale=True``
    is the stacked-FlowNet2 path — one full-resolution flow trained with
    the plain L1/L2 loss (reference flownet2-pytorch losses.py:29-49,
    the default --loss=L1Loss of main.py)."""
    tx = optax.adam(lr)

    def init_fn(key, sample_inputs):
        params = model.init(key, *sample_inputs)
        return {"params": params, "opt": tx.init(params)}

    @jax.jit
    def step_fn(state, inputs, target_flow):
        def loss_fn(params):
            out = model.apply(params, *inputs)
            if single_scale:
                d = out - target_flow
                loss = (jnp.mean(jnp.abs(d)) if loss_norm == "l1"
                        else jnp.mean(d * d))
                return loss, epe(out, target_flow)
            flows = out
            loss = multiscale_loss(flows, target_flow, norm=loss_norm)
            full = jax.image.resize(flows[0], target_flow.shape,
                                    "bilinear") * 4.0
            return loss, epe(full, target_flow)

        (loss, err), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state["params"])
        updates, new_opt = tx.update(grads, state["opt"], state["params"])
        params = optax.apply_updates(state["params"], updates)
        return ({"params": params, "opt": new_opt},
                {"loss": loss, "epe": err})

    return init_fn, step_fn


def make_fused_flow_train_step(model, sprite_bank, batch: int,
                               lr: float = 1e-4, loss_norm: str = "l1",
                               single_scale: bool = False):
    """(init_fn, step_fn) where step(state, key) fuses the synthetic-
    chairs data generation INTO the jitted train step — one XLA program,
    one host→device dispatch per step (the flagship's
    make_fused_train_step pattern, train/step.py). Measured motivation
    (PERF_NOTES r4): the separate datagen dispatch kept ~2.6 ms of
    on-device generation plus a tunnel round-trip on the critical path
    of a ~8 ms network step."""
    _, base_step = make_flow_train_step(model, lr=lr, loss_norm=loss_norm,
                                        single_scale=single_scale)
    tx = optax.adam(lr)
    bank = jnp.asarray(sprite_bank)

    def init_fn(key, sample_inputs):
        params = model.init(key, *sample_inputs)
        # Prime the software pipeline: the first batch is generated at
        # init so step N trains on batch N while generating batch N+1.
        k0 = jax.random.key(0)
        return {"params": params, "opt": tx.init(params),
                "batch": synthetic_flow_batch(k0, bank, batch=batch)}

    @jax.jit
    def step_fn(state, key):
        k_data, k_next = jax.random.split(key)
        cur = state.pop("batch")
        img1, img2, flow = cur
        # Double-buffered datagen: the NEXT batch's generation has no
        # data dependency on this step's update, so inside one XLA
        # program the scheduler interleaves the (VPU-heavy) generator
        # with the (MXU-heavy) network step instead of serializing the
        # two phases — the on-chip analogue of host prefetch
        # (VERDICT r4 #1a: datagen off the critical path).
        nxt = synthetic_flow_batch(k_data, bank, batch=batch)
        new_state, metrics = base_step(state, (img1, img2), flow)
        new_state["batch"] = nxt
        return new_state, metrics, k_next

    return init_fn, step_fn


def train_flownet(model, steps: int = 100, batch: int = 8,
                  lr: float = 1e-4, seed: int = 0,
                  pair_input: bool = True, single_scale: bool = False,
                  data_root=None, validate: bool = False,
                  init_params: Dict = None) -> Dict:
    """Flow training run; returns final metrics. ``pair_input=False`` for
    FlowNetC (two-image signature).

    ``data_root`` switches supervision from the synthetic warp generator
    to a FlyingChairs-layout disk corpus (ppm pairs + .flo,
    reference flownet2-pytorch/datasets.py:223-280); ``validate`` runs the
    EPE sweep over the held-out split afterwards (reference main.py's
    validation loop)."""
    if data_root is not None:
        from ode_rl_tpu.flow.data import FlyingChairsCorpus
        corpus = FlyingChairsCorpus(data_root, batch_size=batch,
                                    is_train=True, seed=seed)
        draw = lambda _k: tuple(map(jnp.asarray, next(corpus)))
    else:
        bank = jnp.asarray(get_sprite_bank())
        draw = lambda k: synthetic_flow_batch(k, bank, batch=batch)

    key = jax.random.key(seed)
    key, dk = jax.random.split(key)
    img1, img2, flow = draw(dk)
    mk_inputs = lambda i1, i2: ((jnp.concatenate([i1, i2], -1),)
                                if pair_input else (i1, i2))
    init_fn, step_fn = make_flow_train_step(model, lr=lr,
                                            single_scale=single_scale)
    state = init_fn(jax.random.key(1), mk_inputs(img1, img2))
    if init_params is not None:
        # Warm start (see graft_params): same tree structure ⇒ the fresh
        # Adam state (zeros of the param shapes) is already correct.
        state["params"] = init_params

    metrics = {}
    for _ in range(steps):
        key, dk = jax.random.split(key)
        img1, img2, flow = draw(dk)
        state, metrics = step_fn(state, mk_inputs(img1, img2), flow)
    out = {k: float(v) for k, v in metrics.items()}
    if validate and data_root is not None:
        from ode_rl_tpu.flow.data import FlyingChairsCorpus, validate_epe
        val = FlyingChairsCorpus(data_root, batch_size=batch,
                                 is_train=False, seed=seed)
        out["val_epe"] = validate_epe(model, state["params"], val,
                                      pair_input=pair_input,
                                      single_scale=single_scale)
    out["state"] = state
    return out


def save_flownet_params(state: Dict, path) -> None:
    """Serialize trained flow-net params (flax msgpack) for reuse as the
    DFP label source (configs: flownet_params_path)."""
    import pathlib

    from flax import serialization

    p = pathlib.Path(path)
    p.parent.mkdir(parents=True, exist_ok=True)
    p.write_bytes(serialization.to_bytes(state["params"]))


def load_flownet_params(path) -> Dict:
    """Inverse of :func:`save_flownet_params` (msgpack → pytree)."""
    import pathlib

    from flax import serialization

    return serialization.msgpack_restore(pathlib.Path(path).read_bytes())


def graft_params(dst: Dict, src: Dict) -> Tuple[Dict, int, int]:
    """Copy leaves from ``src`` into ``dst`` wherever the path exists in
    both and the shapes agree; everything else keeps the ``dst`` value.

    This is the staged-training warm start of the reference: FlowNet2
    (flownet2-pytorch/main.py --resume / the paper's schedule) is trained
    by initializing each sub-network from its separately-trained
    checkpoint before training the stack. Shape mismatches are expected
    and deliberately skipped — e.g. the standalone FlowNetS sees a
    6-channel image pair while flownets1 inside the stack sees the
    12-channel (pair, warped, flow, brightness-error) concatenation, so
    its conv1 input kernel cannot transfer.

    Returns ``(new_tree, n_grafted, n_skipped)`` where skipped counts
    shape-mismatched leaves that stayed at their ``dst`` init.
    """
    grafted = 0
    skipped = 0

    def rec(d, s):
        nonlocal grafted, skipped
        out = {}
        for k, v in d.items():
            if k not in s:
                out[k] = v
            elif isinstance(v, dict) and isinstance(s[k], dict):
                out[k] = rec(v, s[k])
            elif (hasattr(v, "shape") and hasattr(s[k], "shape")
                  and tuple(v.shape) == tuple(s[k].shape)):
                out[k] = jnp.asarray(s[k], dtype=v.dtype)
                grafted += 1
            else:
                out[k] = v
                skipped += 1
        return out

    return rec(dst, src), grafted, skipped
