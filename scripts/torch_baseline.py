#!/usr/bin/env python
"""Reference-equivalent PyTorch ODEConvGRU baseline for bench comparison.

A fresh, minimal PyTorch implementation of the reference's flagship
training step (ODEConvGRU on Moving MNIST, train_mmnist_odecgru_len20_1ch:
10→10 frames, 64 ch, n_ode_layers 3, dopri5 at rtol 1e-4 / atol 1e-5)
with the reference's *execution model*: eager per-op dispatch, a Python
loop over the backward ODE-ConvGRU steps, and an adaptive Dormand–Prince
stepper driven from Python (one dispatch per RK stage) with dense-output
interpolation — i.e., torchdiffeq-style `odeint` semantics, including
backprop through the solver steps.

Writes bench_baseline.json with frames/sec(/device). Run on whatever
PyTorch device is available (CPU in this image; the reference targeted
single GPUs — see BASELINE.md for the hardware caveat).
"""

from __future__ import annotations

import json
import math
import pathlib
import time

import torch
import torch.nn as nn
import torch.nn.functional as F

# Dormand–Prince 5(4) tableau (public constants).
C = [0.0, 1 / 5, 3 / 10, 4 / 5, 8 / 9, 1.0, 1.0]
A = [
    [],
    [1 / 5],
    [3 / 40, 9 / 40],
    [44 / 45, -56 / 15, 32 / 9],
    [19372 / 6561, -25360 / 2187, 64448 / 6561, -212 / 729],
    [9017 / 3168, -355 / 33, 46732 / 5247, 49 / 176, -5103 / 18656],
    [35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84],
]
B = [35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84, 0.0]
B_ERR = [
    35 / 384 - 5179 / 57600, 0.0, 500 / 1113 - 7571 / 16695,
    125 / 192 - 393 / 640, -2187 / 6784 + 92097 / 339200,
    11 / 84 - 187 / 2100, -1 / 40,
]
C_MID = [
    0.5 * 6025192743 / 30085553152, 0.0, 0.5 * 51252292925 / 65400821598,
    0.5 * -2691868925 / 45128329728, 0.5 * 187940372067 / 1594534317056,
    0.5 * -1776094331 / 19743644256, 0.5 * 11237099 / 235043384,
]


def dopri5(func, y0, ts, rtol=1e-4, atol=1e-5, max_steps=256):
    """Eager adaptive DP45 with quartic dense output, grads through steps."""
    t = ts[0].item()
    t_end = ts[-1].item()
    y = y0
    f = func(t, y)
    dt = 0.01 * (t_end - t) + 1e-6
    outs = [None] * len(ts)
    outs[0] = y0
    next_out = 1
    steps = 0
    while t < t_end - 1e-12 and steps < max_steps:
        steps += 1
        dt = min(dt, t_end - t)
        ks = [f]
        for i in range(1, 7):
            yi = y
            for a, k in zip(A[i], ks):
                if a != 0.0:
                    yi = yi + dt * a * k
            ks.append(func(t + C[i] * dt, yi))
        y1 = y
        for b, k in zip(B, ks):
            if b != 0.0:
                y1 = y1 + dt * b * k
        err = None
        for e, k in zip(B_ERR, ks):
            if e != 0.0:
                err = dt * e * k if err is None else err + dt * e * k
        scale = atol + rtol * torch.maximum(y.abs(), y1.abs())
        ratio = torch.sqrt(torch.mean((err / scale) ** 2)).item()
        if ratio <= 1.0:  # accept
            y_mid = y
            for c, k in zip(C_MID, ks):
                if c != 0.0:
                    y_mid = y_mid + dt * c * k
            # dense output for requested times in (t, t+dt]
            while next_out < len(ts) and ts[next_out].item() <= t + dt + 1e-12:
                theta = (ts[next_out].item() - t) / dt
                f0, f1 = ks[0], ks[6]
                a_c = 2 * dt * (f1 - f0) - 8 * (y1 + y) + 16 * y_mid
                b_c = dt * (5 * f0 - 3 * f1) + 18 * y + 14 * y1 - 32 * y_mid
                c_c = dt * (f1 - 4 * f0) - 11 * y - 5 * y1 + 16 * y_mid
                d_c = dt * f0
                outs[next_out] = y + theta * (
                    d_c + theta * (c_c + theta * (b_c + theta * a_c)))
                next_out += 1
            t = t + dt
            y = y1
            f = ks[6]
        factor = min(10.0, max(0.2, 0.9 * ratio ** -0.2 if ratio > 1e-10 else 10.0))
        if ratio > 1.0:
            factor = min(factor, 1.0)
        dt = dt * factor
    for i in range(next_out, len(ts)):
        outs[i] = y
    return torch.stack(outs), steps


class ConvNet(nn.Module):
    def __init__(self, ch, units, layers):
        super().__init__()
        mods = [nn.Conv2d(ch, units, 3, 1, 1)]
        for _ in range(layers):
            mods += [nn.ReLU(), nn.Conv2d(units, units, 3, 1, 1)]
        mods += [nn.ReLU(), nn.Conv2d(units, ch, 3, 1, 1)]
        self.net = nn.Sequential(*mods)

    def forward(self, x):
        return self.net(x)


class ConvGRUCell(nn.Module):
    def __init__(self, ch, k=5):
        super().__init__()
        self.gates = nn.Sequential(
            nn.Conv2d(2 * ch, 2 * ch, k, 1, k // 2),
            nn.GroupNorm(2 * ch // 32, 2 * ch))
        self.cand = nn.Sequential(
            nn.Conv2d(2 * ch, ch, k, 1, k // 2), nn.GroupNorm(ch // 32, ch))

    def forward(self, h, x):
        g = self.gates(torch.cat([x, h], 1))
        z, r = torch.chunk(torch.sigmoid(g), 2, 1)
        c = torch.tanh(self.cand(torch.cat([x, r * h], 1)))
        return (1 - z) * h + z * c


class ODEConvGRU(nn.Module):
    def __init__(self, ch=64, units=64, ode_layers=3):
        super().__init__()
        self.enc = nn.Sequential(
            nn.Conv2d(1, 16, 3, 2, 1), nn.LeakyReLU(0.2),
            nn.Conv2d(16, ch, 3, 2, 1), nn.LeakyReLU(0.2))
        self.ode_enc = ConvNet(ch, units, ode_layers)
        self.cell = ConvGRUCell(ch)
        self.head = nn.Sequential(
            nn.Conv2d(ch, ch, 1), nn.ReLU(), nn.Conv2d(ch, 2 * ch, 1))
        self.ode_dec = ConvNet(ch, units, ode_layers)
        self.dec = nn.Sequential(
            nn.ConvTranspose2d(ch, 32, 4, 2, 1), nn.LeakyReLU(0.2),
            nn.ConvTranspose2d(32, 1, 4, 2, 1))
        self.ch = ch

    def forward(self, frames, ts_obs, ts_pred):
        b, t, c, h, w = frames.shape
        e = self.enc(frames.reshape(b * t, c, h, w))
        e = e.reshape(b, t, self.ch, h // 4, w // 4)
        # backward Euler + GRU fuse, Python loop like the reference
        prev = torch.zeros_like(e[:, 0])
        prev_t = ts_obs[-1].item() + 0.01
        for i in reversed(range(t)):
            t_i = ts_obs[i].item() if i == t - 1 else ts_obs[i + 1].item()
            dt = (ts_obs[i].item() - prev_t) if i == t - 1 else (
                ts_obs[i].item() - ts_obs[i + 1].item())
            y_ode = prev + self.ode_enc(prev) * dt
            prev = self.cell(y_ode, e[:, i])
            prev_t = ts_obs[i].item()
        mu, _ = torch.chunk(self.head(prev), 2, 1)
        sol, nfe_steps = dopri5(lambda tt, y: self.ode_dec(y), mu, ts_pred)
        tt = sol.shape[0]
        out = torch.sigmoid(self.dec(sol.reshape(tt * b, self.ch, h // 4, w // 4)))
        return out.reshape(tt, b, c, h, w).permute(1, 0, 2, 3, 4), nfe_steps


def main():
    torch.manual_seed(0)
    device = "cuda" if torch.cuda.is_available() else "cpu"
    batch, n_in, n_out = 4, 10, 10  # reference config batch_size=4
    model = ODEConvGRU().to(device)
    opt = torch.optim.Adam(model.parameters(), lr=1e-4)
    ts_all = torch.arange(0, n_in + n_out, dtype=torch.float32) / (n_in + n_out)
    ts_obs, ts_pred = ts_all[:n_in], ts_all[n_in:]

    def step():
        x = torch.rand(batch, n_in, 1, 64, 64, device=device)
        target = torch.rand(batch, n_out, 1, 64, 64, device=device)
        opt.zero_grad()
        pred, steps = model(x.to(device), ts_obs, ts_pred)
        loss = F.mse_loss(pred, target)
        loss.backward()
        opt.step()
        return steps

    for _ in range(2):  # warmup
        step()
    n_steps = 5
    t0 = time.perf_counter()
    total_ode_steps = 0
    for _ in range(n_steps):
        total_ode_steps += step()
    elapsed = time.perf_counter() - t0
    fps = batch * (n_in + n_out) * n_steps / elapsed
    result = {
        "frames_per_sec_per_chip": round(fps, 2),
        "device": device,
        "ms_per_step": round(elapsed / n_steps * 1000, 1),
        "mean_solver_steps": total_ode_steps / n_steps,
        "workload": "ODEConvGRU mmnist 10->10 batch4 dopri5 rtol1e-4",
        "note": "PyTorch eager reference-equivalent; see BASELINE.md for "
                "hardware caveats",
    }
    out = pathlib.Path(__file__).resolve().parents[1] / "bench_baseline.json"
    out.write_text(json.dumps(result, indent=2))
    print(json.dumps(result))


if __name__ == "__main__":
    main()
