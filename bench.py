#!/usr/bin/env python
"""Benchmark: ODEConvGRU Moving MNIST training throughput (frames/sec/chip).

Prints ONE JSON line:
  {"metric": "frames_per_sec_per_chip", "value": N, "unit": "frames/s/chip",
   "vs_baseline": R, ...}

Workload matches the reference's flagship config
(train_mmnist_odecgru_len20_1ch: 10→10 frames, 64×64×1, dopri5 at
rtol 1e-4 / atol 1e-5, n_ode_layers 3, 64 channels), with the batch size
raised to feed the TPU (the per-frame cost is what's compared).

The baseline is the measured PyTorch reference-equivalent throughput from
scripts/torch_baseline.py, stored in bench_baseline.json (see BASELINE.md
for hardware caveats).
"""

from __future__ import annotations

import json
import os
import pathlib
import time

import jax
import numpy as np

# v5e bf16 peak (197 TFLOP/s per chip); override for other hardware.
PEAK_FLOPS = float(os.environ.get("ODE_RL_TPU_PEAK_FLOPS", 1.97e14))


def analytic_flops_per_step(cfg, nfe: float) -> float:
    """Whole-train-step FLOPs for the flagship ODEConvGRU workload,
    counted analytically from the architecture (dominant conv/matmul
    terms; elementwise ops excluded — ≪5% at these shapes).

    Counting conventions: 1 MAC = 2 FLOPs; conv FLOPs =
    2·H_out·W_out·C_out·K²·C_in per sample. Training cost = 3× forward
    (activation-grad + weight-grad each ≈ one forward) plus one extra
    forward of the ODE decode for the fast adjoint's step replay
    (ode/fast.py recomputes each accepted step's stages from saved
    state). NFE is the measured per-step mean, so the number tracks the
    solver's actual effort, not a static bound."""
    b = cfg.batch_size
    t_in, t_out = cfg.train_in_seq, cfg.train_out_seq
    res = cfg.resolution                      # 64
    ch = cfg.conv_encoder_out_ch              # latent channels (64)
    units = cfg.neural_ode_n_units
    n_layers = cfg.n_ode_layers
    eh = res // (2 ** cfg.n_downs)            # latent spatial (16)
    conv = lambda hw, cin, cout, k: 2.0 * hw * hw * cout * k * k * cin

    # Encoder per frame: stride-2 3×3 stack 1→16→ch (nn/conv_stacks.py).
    enc = conv(res // 2, cfg.in_channels, 16, 3) + conv(eh, 16, ch, 3)
    # ODE field eval: 3×3 tower ch→units, n_layers×units→units,
    # units→ch at latent resolution (ConvNet in models/odeconvgru.py).
    ode_eval = (conv(eh, ch, units, 3) + n_layers * conv(eh, units, units, 3)
                + conv(eh, units, ch, 3))
    # z0 inference per observed frame: one Euler field eval + ConvGRU
    # cell (5×5 gates conv [2ch→2ch] + candidate [2ch→ch],
    # nn/odeconvgru.py).
    gru = conv(eh, 2 * ch, 2 * ch, 5) + conv(eh, 2 * ch, ch, 5)
    # Decoder per output frame: 4×4 stride-2 transposed convs ch→32→C
    # (a stride-s transposed conv touches K²/s² taps per output pixel).
    dec = (conv(res // 2, ch, 32, 4) // 4
           + conv(res, 32, cfg.in_channels, 4) // 4)

    forward = b * (t_in * (enc + ode_eval + gru)   # encode + z0 pass
                   + nfe * ode_eval                # adaptive decode
                   + t_out * dec)                  # frame decode
    replay = b * nfe * ode_eval                    # fast-adjoint replay
    return 3.0 * forward + replay


def main() -> None:
    import jax.numpy as jnp

    from ode_rl_tpu.core.config import load_config
    from ode_rl_tpu.data import MovingMNIST, make_batch_dict
    from ode_rl_tpu.data.sprites import get_sprite_bank
    from ode_rl_tpu.models import build_model
    from ode_rl_tpu.train.step import (
        create_train_state, make_fused_train_step)

    cfg_path = pathlib.Path(__file__).parent / "configs.yaml"
    cfg = load_config(["defaults", "tpu_bench_odecgru"], cfg_path)

    batch_size = cfg.batch_size
    n_in, n_out = cfg.train_in_seq, cfg.train_out_seq
    loader = iter(MovingMNIST(batch_size=batch_size, n_frames_input=n_in,
                              n_frames_output=n_out,
                              num_digits=cfg.num_digits))
    model = build_model(cfg)
    batch = make_batch_dict(next(loader), n_in=n_in)
    state = create_train_state(model, cfg, batch, jax.random.key(0))
    # Fused step: on-device data generation + train update in ONE XLA
    # program — a single host→device dispatch per step.
    bank = jnp.asarray(get_sprite_bank(cfg.get("data_dir")))
    train_step = make_fused_train_step(model, cfg, bank)

    key = jax.random.key(1)

    # Warmup: compile + train through the early stiff transient. Fresh
    # dynamics pass through a regime (~steps 30-120) where the learned
    # field stiffens and the adaptive solver's step count spikes ~10×
    # before settling (the torch reference exhibits the same growth:
    # solver_steps 3→13→31→51 over its first 150 steps). A 50k-step
    # production run spends <0.3% of its time there, so the steady-state
    # regime is what the headline frames/s measures; mean_nfe in the
    # output discloses the solver-effort level the number was taken at.
    for _ in range(150):
        state, metrics, key = train_step(state, key)
    jax.block_until_ready(metrics)

    # Timed region: the full training step including data generation.
    n_steps = 50
    best = float("inf")
    for _rep in range(3):
        t0 = time.perf_counter()
        for _ in range(n_steps):
            state, metrics, key = train_step(state, key)
        jax.block_until_ready(metrics)
        best = min(best, time.perf_counter() - t0)
    elapsed = best

    n_chips = jax.device_count()
    frames = batch_size * (n_in + n_out) * n_steps
    fps_per_chip = frames / elapsed / n_chips

    baseline_path = pathlib.Path(__file__).parent / "bench_baseline.json"
    vs_baseline = 1.0
    baseline_fps = None
    if baseline_path.exists():
        baseline = json.loads(baseline_path.read_text())
        baseline_fps = baseline.get("frames_per_sec_per_chip")
        if baseline_fps:
            vs_baseline = fps_per_chip / baseline_fps

    metrics_host = jax.device_get(metrics)
    mean_nfe = float(np.asarray(metrics_host.get("nfe", -1)))
    step_s = elapsed / n_steps
    flops_step = analytic_flops_per_step(cfg, max(mean_nfe, 0.0))
    mfu = flops_step / step_s / PEAK_FLOPS
    print(json.dumps({
        "metric": "frames_per_sec_per_chip",
        "value": round(float(fps_per_chip), 2),
        "unit": "frames/s/chip",
        "vs_baseline": round(float(vs_baseline), 3),
        "baseline_frames_per_sec": baseline_fps,
        "n_chips": n_chips,
        "batch_size": batch_size,
        "seq_len": n_in + n_out,
        "steps_timed": n_steps,
        "step_ms": round(step_s * 1e3, 2),
        "mean_nfe": mean_nfe,
        "flops_per_step": round(flops_step),
        "mfu_pct_of_bf16_peak": round(100.0 * mfu, 2),
        "loss": float(np.asarray(metrics_host["loss"])),
        "device": str(jax.devices()[0]),
        "baseline_note": "baseline is torch eager on this image's CPU "
                         "(BASELINE.md) — vs_baseline mixes hardware "
                         "classes; read mfu_pct_of_bf16_peak for "
                         "hardware-normalized efficiency",
    }))


if __name__ == "__main__":
    main()
