#!/usr/bin/env python
"""Component-level timing of the flagship ODEConvGRU train step on TPU.

Times (a) the fused step, (b) forward-only, (c) the ODE decode alone
(fwd and fwd+bwd), (d) the z0-encoder scan alone, (e) conv
micro-benchmarks that bound the speed-of-light for the hot op
(3×3 64→64 at (B,16,16,64)), so optimization effort lands where the
time actually is (VERDICT round-1 item 3).

MEASUREMENT CAVEAT (this machine): the TPU is attached via a remote
dispatch tunnel on which jax.block_until_ready returns at dispatch, not
completion, and a device_get roundtrip costs ~1-200 ms depending on
payload. Single-op rows therefore time dispatch+tiny-fetch (upper
bounds); the trustworthy numbers are the state-threaded fused-step row
and the `differential` rows (chain-length deltas). Measured this way the
hot conv runs at ~140-155 TF/s (≈70-78% of v5e bf16 peak) — XLA's native
conv is already near speed-of-light for this shape (the round-1 "~24
TF/s" reading was a dispatch artifact; see ops/conv3x3.py).

    python scripts/profile_step.py [--batch 128]
"""

from __future__ import annotations

import argparse
import functools
import pathlib
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def _fetch(out):
    """Force completion: device_get a scalar-ish view of one leaf.

    On the remote-dispatch (tunnel) backend, jax.block_until_ready
    returns at dispatch, NOT at completion — timings that rely on it
    measure the host-side dispatch path only (measured: a 64-conv chain
    "completed" in 20 µs that way). A device_get is the only reliable
    completion barrier; keep the fetched payload tiny."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    return jax.device_get(leaf.ravel()[:1] if hasattr(leaf, "ravel") else leaf)


def timeit(fn, *args, n=20, reps=3, name=""):
    """Per-call time including one dispatch + tiny-fetch roundtrip.

    The roundtrip (~1-30 ms on the tunnel) is NOT subtracted — treat
    these rows as upper bounds and inter-row deltas as the signal; the
    authoritative compute numbers are the fused-step row (state-threaded,
    so device execution serializes) and the differential conv rows."""
    _fetch(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        _fetch(out)
        best = min(best, (time.perf_counter() - t0) / n)
    print(f"{name:44s} {best * 1e3:9.3f} ms")
    return best


def diff_time(make_chain, n_small=32, n_big=544, trials=6):
    """Differential chained timing: per-op time from the length-(big-small)
    delta of a scan-chained computation, ending in a tiny fetch — immune
    to both dispatch overhead and the fetch roundtrip."""
    ts = {}
    for n in (n_small, n_big):
        f = make_chain(n)
        _fetch(f())
        best = float("inf")
        for _ in range(trials):
            t0 = time.perf_counter()
            _fetch(f())
            best = min(best, time.perf_counter() - t0)
        ts[n] = best
    return (ts[n_big] - ts[n_small]) / (n_big - n_small)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    args = ap.parse_args()

    from ode_rl_tpu.core.config import load_config
    from ode_rl_tpu.data import MovingMNIST, make_batch_dict
    from ode_rl_tpu.data.sprites import get_sprite_bank
    from ode_rl_tpu.models import build_model
    from ode_rl_tpu.train.step import (
        create_train_state, make_fused_train_step)

    cfg_path = pathlib.Path(__file__).parents[1] / "configs.yaml"
    cfg = load_config(["defaults", "tpu_bench_odecgru"], cfg_path)
    cfg = cfg.replace(batch_size=args.batch)
    b = args.batch
    dt = jnp.bfloat16
    print("device:", jax.devices()[0])

    # ---- full fused step ----------------------------------------------
    loader = iter(MovingMNIST(batch_size=b, n_frames_input=10,
                              n_frames_output=10, num_digits=3))
    model = build_model(cfg)
    batch = make_batch_dict(next(loader), n_in=10)
    state = create_train_state(model, cfg, batch, jax.random.key(0))
    bank = jnp.asarray(get_sprite_bank(cfg.get("data_dir")))
    fused = make_fused_train_step(model, cfg, bank)

    # the fused step donates its state — thread it like the train loop does
    st, key = state, jax.random.key(1)
    for _ in range(3):  # warmup/compile
        st, m, key = fused(st, key)
    jax.block_until_ready(m)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(10):
            st, m, key = fused(st, key)
        jax.block_until_ready(m)
        best = min(best, (time.perf_counter() - t0) / 10)
    full = best
    print(f"{'fused train step (fwd+bwd+update+datagen)':44s} "
          f"{full * 1e3:9.3f} ms")

    state = create_train_state(model, cfg, batch, jax.random.key(0))

    # ---- forward only ---------------------------------------------------
    @jax.jit
    def fwd(params, batch):
        loss, _ = model.apply(params, batch, train=True, method=model.loss,
                              rngs={"sample": jax.random.key(9),
                                    "dropout": jax.random.key(3)})
        return loss
    variables = {"params": state.params, **state.model_state}
    f_t = timeit(fwd, variables, batch, n=10, name="forward only (loss)")

    # ---- ODE decode alone ----------------------------------------------
    from ode_rl_tpu.nn.conv_stacks import ConvNet
    from ode_rl_tpu.ode.fast import odeint_fast

    ode_net = ConvNet(out_ch=64, n_layers=3, n_units=64, activation="relu",
                      dtype=dt, param_dtype=jnp.float32)
    z0 = jax.random.normal(jax.random.key(2), (b, 16, 16, 64), dt) * 0.3
    p_ode = ode_net.init(jax.random.key(3), z0)
    ts = jnp.arange(10, 20, dtype=jnp.float32) / 20.0

    @jax.jit
    def ode_fwd(p, z0):
        ys, stats = odeint_fast(lambda t, y, pp: ode_net.apply(pp, y),
                                z0, ts, p, rtol=1e-4, atol=1e-5,
                                max_steps=128)
        return jnp.mean(ys.astype(jnp.float32)), stats.nfe

    @jax.jit
    def ode_bwd(p, z0):
        g = jax.grad(lambda pp: ode_fwd(pp, z0)[0])(p)
        return jax.tree_util.tree_reduce(
            lambda a, x: a + jnp.sum(jnp.square(x.astype(jnp.float32))),
            g, 0.0)

    _, nfe = jax.jit(ode_fwd)(p_ode, z0)
    print(f"{'  (ode decode nfe)':44s} {int(nfe):9d}")
    timeit(lambda: ode_fwd(p_ode, z0)[0], n=10, name="ode decode fwd")
    timeit(ode_bwd, p_ode, z0, n=10, name="ode decode fwd+bwd")

    # ---- z0 encoder scan alone -------------------------------------------
    from ode_rl_tpu.nn.odeconvgru import ODEConvGRUEncoder
    enc = ODEConvGRUEncoder(ch=64, ode_n_layers=3, ode_n_units=64,
                            dtype=dt, param_dtype=jnp.float32)
    xs = jax.random.normal(jax.random.key(4), (b, 10, 16, 16, 64), dt) * 0.3
    tso = jnp.arange(10, dtype=jnp.float32) / 20.0
    p_enc = enc.init(jax.random.key(5), xs, tso)

    @jax.jit
    def enc_fwd(p, xs):
        mu, std, _ = enc.apply(p, xs, tso)
        return jnp.mean(mu.astype(jnp.float32))

    @jax.jit
    def enc_bwd(p, xs):
        g = jax.grad(lambda pp: enc_fwd(pp, xs))(p)
        return jax.tree_util.tree_reduce(
            lambda a, x: a + jnp.sum(jnp.square(x.astype(jnp.float32))),
            g, 0.0)
    timeit(enc_fwd, p_enc, xs, n=10, name="z0 encoder scan fwd")
    timeit(enc_bwd, p_enc, xs, n=10, name="z0 encoder scan fwd+bwd")

    # ---- datagen / loss+grad / update in isolation -----------------------
    from ode_rl_tpu.data.mmnist import generate_moving_mnist

    @jax.jit
    def datagen(key):
        v = generate_moving_mnist(key, bank, batch=b, n_frames=20,
                                  num_digits=3)
        return jnp.sum(v)
    timeit(datagen, jax.random.key(11), n=10, name="datagen (B,20,64,64)")

    @jax.jit
    def loss_grad(params, batch, key):
        def lf(p):
            loss, _ = model.apply(p, batch, train=True, method=model.loss,
                                  rngs={"sample": key,
                                        "dropout": jax.random.fold_in(key, 7)})
            return loss
        l, g = jax.value_and_grad(lf)(params)
        return l, jax.tree_util.tree_reduce(
            lambda a, x: a + jnp.sum(jnp.square(x.astype(jnp.float32))), g, 0.)
    timeit(lambda: loss_grad(variables, batch, jax.random.key(5))[0], n=10,
           name="loss fwd+bwd (no update)")

    import optax
    tx = optax.adam(1e-4)
    opt_state = tx.init(state.params)

    @jax.jit
    def adam_update(params, opt_state):
        g = jax.tree_util.tree_map(lambda p: p * 1e-3, params)
        gn = optax.global_norm(g)
        updates, new_opt = tx.update(g, opt_state, params)
        return optax.apply_updates(params, updates), new_opt, gn
    timeit(lambda: adam_update(state.params, opt_state)[2], n=20,
           name="adam update + grad_norm")

    # ---- encoder / decoder conv stacks -----------------------------------
    from ode_rl_tpu.nn.conv_stacks import ConvDecoder, ConvEncoder
    cenc = ConvEncoder(out_ch=64, n_downs=2, activation="leaky_relu",
                       dtype=dt, param_dtype=jnp.float32)
    frames = jax.random.uniform(jax.random.key(12), (b * 20, 64, 64, 1), dt)
    p_cenc = cenc.init(jax.random.key(13), frames)

    @jax.jit
    def enc_stack_bwd(p, x):
        g = jax.grad(lambda pp: jnp.mean(
            cenc.apply(pp, x).astype(jnp.float32)))(p)
        return jax.tree_util.tree_reduce(
            lambda a, v: a + jnp.sum(jnp.square(v.astype(jnp.float32))), g, 0.)
    timeit(lambda: jnp.mean(cenc.apply(p_cenc, frames).astype(jnp.float32)),
           n=10, name="frame conv-encoder fwd (B*20 frames)")
    timeit(enc_stack_bwd, p_cenc, frames, n=10,
           name="frame conv-encoder fwd+bwd")

    cdec = ConvDecoder(out_ch=1, n_ups=2, activation="leaky_relu",
                       dtype=dt, param_dtype=jnp.float32)
    lat = jax.random.normal(jax.random.key(14), (b * 10, 16, 16, 64), dt)
    p_cdec = cdec.init(jax.random.key(15), lat)

    @jax.jit
    def dec_stack_bwd(p, x):
        g = jax.grad(lambda pp: jnp.mean(
            cdec.apply(pp, x).astype(jnp.float32)))(p)
        return jax.tree_util.tree_reduce(
            lambda a, v: a + jnp.sum(jnp.square(v.astype(jnp.float32))), g, 0.)
    timeit(lambda: jnp.mean(cdec.apply(p_cdec, lat).astype(jnp.float32)),
           n=10, name="frame conv-decoder fwd (B*10 frames)")
    timeit(dec_stack_bwd, p_cdec, lat, n=10,
           name="frame conv-decoder fwd+bwd")

    # ---- conv micro-benchmarks (differential — the reliable numbers) -----
    # hot op: 3×3 stride-1 64→64 at (B,16,16,64)
    w = jax.random.normal(jax.random.key(6), (3, 3, 64, 64), dt) * 0.05

    def conv(y, w):
        return jax.lax.conv_general_dilated(
            y, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=dt)

    y0 = jax.random.normal(jax.random.key(7), (b, 16, 16, 64), dt)

    def make_conv_chain(n):
        @jax.jit
        def chain(y, w):
            def body(yy, _):
                return jnp.tanh(conv(yy, w)), None
            yy, _ = jax.lax.scan(body, y, None, length=n)
            return yy
        return lambda: chain(y0, w)

    per = diff_time(make_conv_chain)
    flops = 2 * b * 16 * 16 * 64 * 9 * 64
    print(f"{'conv 3x3 64→64 (B,16,16) differential':44s} "
          f"{per * 1e6:9.1f} µs  ({flops / per / 1e12:.1f} TF/s)")

    # same FLOPs as pure matmul (im2col-shaped): M=B*256, K=576, N=64
    a = jax.random.normal(jax.random.key(8), (b * 256, 576), dt)
    wm = jax.random.normal(jax.random.key(9), (576, 64), dt) * 0.05

    @jax.jit
    def mm_chain(a, wm):
        def body(i, acc):
            return acc + jnp.dot(a, wm, preferred_element_type=dt).sum(0)
        return jax.lax.fori_loop(0, 64, body, jnp.zeros((64,), dt))
    t_mm = timeit(mm_chain, a, wm, n=5, name="64× matmul (B*256,576)x(576,64)")
    print(f"{'  per matmul':44s} {t_mm / 64 * 1e6:9.1f} µs  "
          f"({flops / (t_mm / 64) / 1e12:.1f} TF/s)")

    # wider-N variant: K=576, N=128 (what channel-packing would buy)
    wm2 = jax.random.normal(jax.random.key(10), (576, 128), dt) * 0.05

    @jax.jit
    def mm2_chain(a, wm2):
        def body(i, acc):
            return acc + jnp.dot(a, wm2, preferred_element_type=dt).sum(0)
        return jax.lax.fori_loop(0, 64, body, jnp.zeros((128,), dt))
    t2 = timeit(mm2_chain, a, wm2, n=5, name="64× matmul N=128")
    print(f"{'  per matmul N=128':44s} {t2 / 64 * 1e6:9.1f} µs  "
          f"({2 * flops / (t2 / 64) / 1e12:.1f} TF/s)")

    print(f"\nstep breakdown: full={full*1e3:.1f}ms fwd={f_t*1e3:.1f}ms "
          f"(bwd+update≈{(full-f_t)*1e3:.1f}ms)")


if __name__ == "__main__":
    main()
