"""Cross-framework numerics parity: flax modules vs torch replicas with
identical weights (the strongest available stand-in for reference parity
given the reference's stack is PyTorch)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp
import torch.nn as tnn


def test_convgru_cell_matches_torch():
    """Our ConvGRUCell must reproduce the reference cell's math exactly
    (fused gate conv + GroupNorm + sigmoid/tanh gating,
    /root/reference/modules/ConvGRUCell.py:40-86) when given the same
    weights."""
    from ode_rl_tpu.nn.convgru import ConvGRUCell

    c = 32
    b, h, w = 2, 8, 8
    rng = np.random.RandomState(0)
    x_np = rng.randn(b, h, w, c).astype(np.float32)
    h_np = rng.randn(b, h, w, c).astype(np.float32)

    cell = ConvGRUCell(hidden_dim=c, kernel_size=5, gate_impl="xla")
    variables = cell.init(jax.random.key(0), jnp.asarray(h_np),
                          jnp.asarray(x_np))
    params = variables["params"]

    # torch replica of the reference cell
    class TorchCell(tnn.Module):
        def __init__(self):
            super().__init__()
            self.conv_gates = tnn.Conv2d(2 * c, 2 * c, 5, 1, 2)
            self.gn_gates = tnn.GroupNorm(2 * c // 32, 2 * c)
            self.conv_can = tnn.Conv2d(2 * c, c, 5, 1, 2)
            self.gn_can = tnn.GroupNorm(c // 32, c)

        def forward(self, x, hcur):
            comb = torch.cat([x, hcur], 1)
            gates = self.gn_gates(self.conv_gates(comb))
            z, r = torch.chunk(torch.sigmoid(gates), 2, 1)
            cand = torch.tanh(self.gn_can(
                self.conv_can(torch.cat([x, r * hcur], 1))))
            return (1 - z) * hcur + z * cand

    tc = TorchCell().eval()
    with torch.no_grad():
        # flax kernels are (kh, kw, in, out); torch wants (out, in, kh, kw)
        tc.conv_gates.weight.copy_(torch.from_numpy(np.transpose(
            np.asarray(params["conv_gates"]["kernel"]), (3, 2, 0, 1))))
        tc.conv_gates.bias.copy_(torch.from_numpy(
            np.asarray(params["conv_gates"]["bias"])))
        tc.conv_can.weight.copy_(torch.from_numpy(np.transpose(
            np.asarray(params["conv_cand"]["kernel"]), (3, 2, 0, 1))))
        tc.conv_can.bias.copy_(torch.from_numpy(
            np.asarray(params["conv_cand"]["bias"])))
        tc.gn_gates.weight.copy_(torch.from_numpy(
            np.asarray(params["gates_scale"])))
        tc.gn_gates.bias.copy_(torch.from_numpy(
            np.asarray(params["gates_bias"])))
        tc.gn_can.weight.copy_(torch.from_numpy(
            np.asarray(params["cand_scale"])))
        tc.gn_can.bias.copy_(torch.from_numpy(
            np.asarray(params["cand_bias"])))

        ref = tc(torch.from_numpy(x_np.transpose(0, 3, 1, 2)),
                 torch.from_numpy(h_np.transpose(0, 3, 1, 2))).numpy()

    ours = cell.apply(variables, jnp.asarray(h_np), jnp.asarray(x_np))
    np.testing.assert_allclose(
        np.asarray(ours).transpose(0, 3, 1, 2), ref, atol=2e-5)


def test_gru_cell_matches_torch():
    """flax nn.GRUCell (used for slot attention / S3VAE heads) must
    match torch.nn.GRUCell given the same weights."""
    import flax.linen as nn

    f = 16
    rng = np.random.RandomState(1)
    x_np = rng.randn(3, f).astype(np.float32)
    h_np = rng.randn(3, f).astype(np.float32)

    cell = nn.GRUCell(features=f)
    variables = cell.init(jax.random.key(0), jnp.asarray(h_np),
                          jnp.asarray(x_np))
    p = variables["params"]

    tcell = tnn.GRUCell(f, f).eval()
    with torch.no_grad():
        # flax: ir/iz/in kernels (in, out); torch: weight_ih (3f, f) rows r,z,n
        w_ih = np.concatenate([
            np.asarray(p["ir"]["kernel"]).T,
            np.asarray(p["iz"]["kernel"]).T,
            np.asarray(p["in"]["kernel"]).T], 0)
        w_hh = np.concatenate([
            np.asarray(p["hr"]["kernel"]).T,
            np.asarray(p["hz"]["kernel"]).T,
            np.asarray(p["hn"]["kernel"]).T], 0)
        # flax puts gate biases on the input projections (+hn); torch
        # splits b_ih/b_hh — the sums are what matters.
        b_ih = np.concatenate([
            np.asarray(p["ir"]["bias"]), np.asarray(p["iz"]["bias"]),
            np.asarray(p["in"]["bias"])])
        b_hh = np.concatenate([
            np.zeros(f, np.float32), np.zeros(f, np.float32),
            np.asarray(p["hn"]["bias"])])
        tcell.weight_ih.copy_(torch.from_numpy(w_ih))
        tcell.weight_hh.copy_(torch.from_numpy(w_hh))
        tcell.bias_ih.copy_(torch.from_numpy(b_ih))
        tcell.bias_hh.copy_(torch.from_numpy(b_hh))
        ref = tcell(torch.from_numpy(x_np), torch.from_numpy(h_np)).numpy()

    new_h, _ = cell.apply(variables, jnp.asarray(h_np), jnp.asarray(x_np))
    np.testing.assert_allclose(np.asarray(new_h), ref, atol=2e-5)


def test_dopri5_matches_torch_eager_reference():
    """Our on-device dopri5 vs the eager torch DP45 implementation in
    scripts/torch_baseline.py (same tableau/controller/dense output) on a
    nonlinear ODE — trajectories must agree to solver tolerance."""
    import sys
    sys.path.insert(0, "scripts")
    from torch_baseline import dopri5 as torch_dopri5

    from ode_rl_tpu.ode import odeint

    a = 0.8

    def f_jax(t, y):
        return -a * y + jnp.sin(3.0 * y)

    def f_torch(t, y):
        return -a * y + torch.sin(3.0 * y)

    y0 = np.linspace(0.5, 1.5, 8).astype(np.float32).reshape(2, 4)
    ts = np.linspace(0.0, 2.0, 9).astype(np.float32)

    ours = odeint(f_jax, jnp.asarray(y0), jnp.asarray(ts),
                  rtol=1e-6, atol=1e-8, max_steps=512)
    with torch.no_grad():
        ref, _ = torch_dopri5(f_torch, torch.from_numpy(y0),
                              torch.from_numpy(ts), rtol=1e-6, atol=1e-8,
                              max_steps=512)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=1e-4)
