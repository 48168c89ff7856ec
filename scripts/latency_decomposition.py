#!/usr/bin/env python
"""Measured latency-bound decompositions for the sub-25%-MFU families
(VERDICT r4 #1 "done" criterion: no family below 25% MFU without an
accompanying MEASURED latency-bound decomposition — not just the
architectural argument in PERF_NOTES.md).

Method — batch-scaling exponent. One knob separates the two regimes:
a FLOPs-bound program's step time scales ~linearly with batch size,
while a latency-bound one (a sequential ``lax.scan`` of MXU-undersized
ops, where per-iteration dispatch + HBM weight refetch dominates) is
nearly flat in batch.  For each family we time the full jitted train
step at the family-bench batch B and at B/2 and B/4 and report

    alpha = log(t_B / t_{B/4}) / log(4)

alpha ≈ 1 → compute-bound (time ∝ batch): the MFU number is the
  honest efficiency of saturating work, and raising it means changing
  the model, not the implementation.
alpha ≈ 0 → latency-bound: the chip is idle waiting on the sequential
  chain; batch (and hence MFU at fixed batch) is not the constraint,
  and the family trains wall-clock-bound by T × per-step latency.

For Dreamer the script additionally isolates the RSSM itself: the
observe scan alone (forward), ONE obs_step (the per-iteration latency
floor incl. dispatch), and the HBM weight-traffic floor
T × bytes(RSSM params) / BW — the scan's irreducible time at batches
too small to amortize weight refetch (same structural bound as the
reference's cuDNN-less torch RSSM, dreamerv2/networks.py:376-405).

Writes results/round5/latency_decomposition.json and prints one JSON
line per family.  Timing protocol (readback-synced windows) is
bench.py's — see bench._timed / bench._sync for why
``block_until_ready`` is not a barrier on this backend.
"""

from __future__ import annotations

import argparse
import json
import math
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import bench  # noqa: E402  (repo-root bench.py: _timed, _mmnist_state, ...)

HBM_BYTES_PER_S = 8.19e11  # v5e ~819 GB/s


# ---------------------------------------------------------------------------
# Per-family step builders at a given batch size — mirror bench.py's
# setups exactly (same configs, dtypes, loss), batch parameterized.

def _std_step(block: str, b: int, model_override=None, with_flow=False,
              overrides=None):
    from ode_rl_tpu.models import build_model
    from ode_rl_tpu.train.step import create_train_state, make_train_step

    cfg, batch = bench._mmnist_state(
        block, b, with_flow=with_flow,
        overrides={"compute_dtype": "bfloat16", **(overrides or {})})
    model = model_override(cfg) if model_override else build_model(cfg)
    state = create_train_state(model, cfg, batch, jax.random.key(0))
    train_step = make_train_step(model, donate=False)

    def step(carry):
        state, key = carry[0], carry[1]
        key, sub = jax.random.split(key)
        new_state, m = train_step(state, batch, sub)
        return (new_state, key, m["loss"])

    return cfg, step, (state, jax.random.key(1), 0.0)


def _family_steps(name: str, b: int):
    if name == "dreamer":
        return _std_step("train_mmnist_dreamer", b)
    if name == "s3vae":
        return _std_step("train_mmnist_extrap_s3vae", b, with_flow=True)
    if name == "convlstm":
        from ode_rl_tpu.models.convlstm import ConvLSTMED

        return _std_step(
            "train_mmnist_convlstm", b,
            model_override=lambda cfg: ConvLSTMED(
                in_channels=cfg.in_channels, dtype=jnp.bfloat16))
    if name == "vidode_gan":
        from ode_rl_tpu.core.config import Config
        from ode_rl_tpu.models.vidode import VidODEModel
        from ode_rl_tpu.train.gan import create_gan_state, make_gan_train_step

        cfg, batch = bench._mmnist_state("train_mmnist_vidode_gan", b)
        model = VidODEModel(in_channels=cfg.in_channels,
                            n_downs=cfg.get("n_downs", 2),
                            n_layers=cfg.get("n_layers", 2),
                            ode_max_steps=128, rtol=1e-3, atol=1e-4,
                            dtype=jnp.bfloat16)
        state = create_gan_state(model, Config({"lr": 8e-4,
                                                "lr_decay": 0.99}),
                                 batch, jax.random.key(0),
                                 steps_per_epoch=100,
                                 disc_dtype=jnp.bfloat16)
        gan_step = make_gan_train_step(model, extrap=True, lamb_adv=0.003,
                                       disc_dtype=jnp.bfloat16)

        def step(carry):
            state, key = carry[0], carry[1]
            key, sub = jax.random.split(key)
            new_state, m = gan_step(state, batch, sub)
            return (new_state, key, m["g_loss"])

        return cfg, step, (state, jax.random.key(1), 0.0)
    raise ValueError(name)


FAMILY_BATCHES = {  # bench batch B → measured at [B, B/2, B/4]
    "dreamer": 64, "s3vae": 32, "convlstm": 32, "vidode_gan": 32}
FAMILY_WARMUP = {"vidode_gan": 60}


def batch_scaling(name: str, n_steps: int) -> dict:
    B = FAMILY_BATCHES[name]
    times = {}
    for b in (B, B // 2, B // 4):
        _, step, carry = _family_steps(name, b)
        _, step_s = bench._timed(step, carry,
                                 warmup=FAMILY_WARMUP.get(name, 10),
                                 n_steps=n_steps)
        times[b] = step_s * 1e3
        print(f"  {name} b={b}: {step_s * 1e3:.2f} ms", file=sys.stderr)
    alpha = math.log(times[B] / times[B // 4]) / math.log(4.0)
    return {"family": name, "bench_batch": B,
            "step_ms_by_batch": {str(k): round(v, 3)
                                 for k, v in times.items()},
            "batch_scaling_exponent": round(alpha, 3),
            "reading": ("compute-bound" if alpha > 0.75 else
                        "latency-bound" if alpha < 0.4 else "mixed")}


# ---------------------------------------------------------------------------
def dreamer_rssm_isolation(n_steps: int) -> dict:
    """Time the RSSM scan alone vs ONE obs_step, against the HBM
    weight-refetch floor."""
    from ode_rl_tpu.wm import RSSM

    cfg, _ = bench._mmnist_state("train_mmnist_dreamer", 64)
    b = 64
    t = cfg.train_in_seq + cfg.train_out_seq
    d = cfg.get("cnn_depth", 32)
    e = 2 * 2 * 8 * d
    rssm = RSSM(stoch=cfg.get("dyn_stoch", 50),
                deter=cfg.get("dyn_deter", 200),
                hidden=cfg.get("dyn_hidden", 200),
                discrete=cfg.get("dyn_discrete", 0), dtype=jnp.bfloat16)
    embed = jax.random.normal(jax.random.key(0), (b, t, e), jnp.bfloat16)
    variables = rssm.init(jax.random.key(1), embed, jax.random.key(2),
                          method=rssm.observe)
    n_params = sum(int(np.prod(v.shape))
                   for v in jax.tree_util.tree_leaves(variables))
    weight_bytes = n_params * 4  # fp32 master params

    observe = jax.jit(lambda v, e, k: jax.tree_util.tree_leaves(
        rssm.apply(v, e, k, method=rssm.observe))[0].sum())

    def obs_scan(carry):
        key, _ = carry
        key, sub = jax.random.split(key)
        return (key, observe(variables, embed, sub))

    _, scan_s = bench._timed(obs_scan, (jax.random.key(3), 0.0),
                             warmup=3, n_steps=n_steps)

    state = rssm.initial(b)
    one = jax.jit(lambda v, s, e, k: jax.tree_util.tree_leaves(
        rssm.apply(v, s, e, k, method=rssm.obs_step))[0].sum())

    def one_step(carry):
        key, _ = carry
        key, sub = jax.random.split(key)
        return (key, one(variables, state, embed[:, 0], sub))

    _, one_s = bench._timed(one_step, (jax.random.key(4), 0.0),
                            warmup=3, n_steps=n_steps)

    floor_ms = t * weight_bytes / HBM_BYTES_PER_S * 1e3
    return {"family": "dreamer_rssm_isolated", "batch": b, "t_steps": t,
            "observe_scan_ms": round(scan_s * 1e3, 3),
            "single_obs_step_ms": round(one_s * 1e3, 3),
            "t_x_single_step_ms": round(t * one_s * 1e3, 3),
            "rssm_params": n_params,
            "hbm_weight_refetch_floor_ms": round(floor_ms, 3),
            "note": ("observe ≈ T × per-step latency ⇒ the scan pays "
                     "the sequential per-iteration cost T times; the "
                     "HBM floor is the irreducible weight-refetch time "
                     "at batches that don't amortize it")}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--families", default="dreamer,s3vae,convlstm,vidode_gan")
    ap.add_argument("--n_steps", type=int, default=20)
    ap.add_argument("--out",
                    default="results/round5/latency_decomposition.json")
    args = ap.parse_args()

    rows = []
    for fam in args.families.split(","):
        rows.append(batch_scaling(fam.strip(), args.n_steps))
        print(json.dumps(rows[-1]))
    if "dreamer" in args.families:
        rows.append(dreamer_rssm_isolation(args.n_steps))
        print(json.dumps(rows[-1]))

    out = pathlib.Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(
        {"device": str(jax.devices()[0]), "rows": rows}, indent=2))
    print(f"wrote {out}", file=sys.stderr)


if __name__ == "__main__":
    main()
