"""LPIPS weight-ingestion path (VERDICT round-3 item #7).

The reference downloads torchvision AlexNet weights at runtime
(/root/reference/Vid-ODE/eval_models/pretrained_networks.py); this image
has zero egress, so the framework ships a torch-layout→npz converter
(scripts/convert_lpips_weights.py) + load_torch_weights. These tests
prove the full path with synthetically generated weights:

  1. layer mapping: every torchvision `features.{idx}` conv lands on the
     right flax tap with the right transpose;
  2. output equality: the flax LPIPS forward under converted weights
     matches a torch re-implementation of the reference's net-lin math
     (unit-normalize per channel → squared diff → abs(lin)-weighted sum
     → spatial mean) to float tolerance.
"""

from __future__ import annotations

import pathlib
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

from ode_rl_tpu.eval_models.lpips import (  # noqa: E402
    _ALEX_PLAN, init_lpips, load_torch_weights, lpips_distance)

ROOT = pathlib.Path(__file__).resolve().parent.parent


def _synthetic_alexnet_state(seed: int = 0):
    """A torchvision-AlexNet-layout features state_dict with random
    weights (shapes exactly torchvision.models.alexnet)."""
    g = torch.Generator().manual_seed(seed)
    specs = [  # (idx in features, out, in, k)
        (0, 64, 3, 11), (3, 192, 64, 5), (6, 384, 192, 3),
        (8, 256, 384, 3), (10, 256, 256, 3)]
    state = {}
    for idx, o, i, k in specs:
        state[f"features.{idx}.weight"] = (
            torch.randn(o, i, k, k, generator=g) * 0.05)
        state[f"features.{idx}.bias"] = torch.randn(o, generator=g) * 0.05
    return state


def _synthetic_lins_state(seed: int = 1):
    g = torch.Generator().manual_seed(seed)
    chans = [64, 192, 384, 256, 256]
    return {f"lin{i}.model.1.weight":
            torch.rand(1, c, 1, 1, generator=g) for i, c in enumerate(chans)}


class _TorchAlexTaps(tnn.Module):
    """torchvision AlexNet features with the 5 relu taps the LPIPS stack
    reads (reference pretrained_networks.py alexnet slices)."""

    def __init__(self, state):
        super().__init__()
        self.c0 = tnn.Conv2d(3, 64, 11, 4, 2)
        self.c1 = tnn.Conv2d(64, 192, 5, 1, 2)
        self.c2 = tnn.Conv2d(192, 384, 3, 1, 1)
        self.c3 = tnn.Conv2d(384, 256, 3, 1, 1)
        self.c4 = tnn.Conv2d(256, 256, 3, 1, 1)
        self.pool = tnn.MaxPool2d(3, 2)
        convs = [self.c0, self.c1, self.c2, self.c3, self.c4]
        with torch.no_grad():
            for i, (conv, idx) in enumerate(zip(convs, [0, 3, 6, 8, 10])):
                conv.weight.copy_(state[f"features.{idx}.weight"])
                conv.bias.copy_(state[f"features.{idx}.bias"])

    def forward(self, x):
        taps = []
        h = torch.relu(self.c0(x)); taps.append(h)
        h = torch.relu(self.c1(self.pool(h))); taps.append(h)
        h = torch.relu(self.c2(self.pool(h))); taps.append(h)
        h = torch.relu(self.c3(h)); taps.append(h)
        h = torch.relu(self.c4(h)); taps.append(h)
        return taps


def _torch_lpips(alex_state, lins_state, img1, img2):
    """Reference net-lin math in torch (dist_model.py forward):
    scale inputs, tap features, unit-normalize, squared diff, lin
    weights, spatial average, sum over taps."""
    net = _TorchAlexTaps(alex_state).eval()
    shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)
    norm_in = lambda im: (im * 2.0 - 1.0 - shift) / scale
    with torch.no_grad():
        f1 = net(norm_in(img1))
        f2 = net(norm_in(img2))
        total = 0.0
        for i, (a, b) in enumerate(zip(f1, f2)):
            na = a / (a.norm(dim=1, keepdim=True) + 1e-10)
            nb = b / (b.norm(dim=1, keepdim=True) + 1e-10)
            lin = lins_state[f"lin{i}.model.1.weight"].reshape(1, -1, 1, 1)
            w = (na - nb).pow(2) * lin.abs()
            total = total + w.sum(dim=1).mean(dim=(1, 2))
    return total.numpy()


def _run_converter(tmp_path, alex_state, lins_state):
    alex_pth = tmp_path / "alexnet.pth"
    lins_pth = tmp_path / "lins.pth"
    torch.save(alex_state, alex_pth)
    torch.save(lins_state, lins_pth)
    alex_npz = tmp_path / "alexnet.npz"
    lins_npz = tmp_path / "lins.npz"
    subprocess.run(
        [sys.executable, str(ROOT / "scripts/convert_lpips_weights.py"),
         "--alexnet", str(alex_pth), "--lins", str(lins_pth),
         "--out-alexnet", str(alex_npz), "--out-lins", str(lins_npz)],
        check=True, capture_output=True)
    return alex_npz, lins_npz


def test_converter_layer_mapping(tmp_path):
    alex_state = _synthetic_alexnet_state()
    lins_state = _synthetic_lins_state()
    alex_npz, lins_npz = _run_converter(tmp_path, alex_state, lins_state)

    data = np.load(alex_npz)
    for i, (f, k, s, p) in enumerate(_ALEX_PLAN):
        assert data[f"conv{i}_w"].shape[0] == f  # OIHW out-channels
        assert data[f"conv{i}_w"].shape[2] == k
    lins = np.load(lins_npz)
    for i, c in enumerate([64, 192, 384, 256, 256]):
        assert lins[f"lin{i}"].shape == (c,)

    variables = load_torch_weights(init_lpips(), str(alex_npz),
                                   str(lins_npz))
    params = variables["params"]
    for i, idx in enumerate([0, 3, 6, 8, 10]):
        ref_w = alex_state[f"features.{idx}.weight"].numpy()
        got = np.asarray(params["alex"][f"conv{i}"]["kernel"])
        np.testing.assert_array_equal(got, ref_w.transpose(2, 3, 1, 0))
        np.testing.assert_array_equal(
            np.asarray(params["alex"][f"conv{i}"]["bias"]),
            alex_state[f"features.{idx}.bias"].numpy())
        np.testing.assert_array_equal(
            np.asarray(params[f"lin{i}"]),
            lins_state[f"lin{i}.model.1.weight"].numpy().reshape(-1))


def test_converted_lpips_matches_torch_oracle(tmp_path):
    alex_state = _synthetic_alexnet_state()
    lins_state = _synthetic_lins_state()
    alex_npz, lins_npz = _run_converter(tmp_path, alex_state, lins_state)
    variables = load_torch_weights(init_lpips(), str(alex_npz),
                                   str(lins_npz))

    rng = np.random.RandomState(3)
    a = rng.rand(2, 64, 64, 3).astype(np.float32)
    b = rng.rand(2, 64, 64, 3).astype(np.float32)
    ours = np.asarray(lpips_distance(variables, jnp.asarray(a),
                                     jnp.asarray(b), calibrated=True))
    ref = _torch_lpips(alex_state, lins_state,
                       torch.from_numpy(a.transpose(0, 3, 1, 2)),
                       torch.from_numpy(b.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-5)


def test_missing_npz_raises():
    """The train loop hard-errors on a dangling lpips_alexnet_npz path
    rather than silently falling back to uncalibrated features."""
    with pytest.raises(Exception):
        load_torch_weights(init_lpips(), "/nonexistent/alexnet.npz")


def test_uncalibrated_lpips_metric_key_is_flagged(tmp_path):
    """VERDICT r4 #10: the calibration status must be emitted by the
    metric code itself — uncalibrated runs report under the key
    'lpips_uncalibrated', so no artifact can print a plain 'lpips'
    column without real weights."""
    from ode_rl_tpu.core.config import Config
    from ode_rl_tpu.train.loop import _make_lpips_horizon_fn

    fn = _make_lpips_horizon_fn(Config({"model": "VidODE",
                                        "eval_lpips": "auto"}))
    assert fn.metric_key == "lpips_uncalibrated"

    alex_state = _synthetic_alexnet_state()
    lins_state = _synthetic_lins_state()
    alex_npz, lins_npz = _run_converter(tmp_path, alex_state, lins_state)
    fn2 = _make_lpips_horizon_fn(Config({
        "model": "VidODE", "eval_lpips": "auto",
        "lpips_alexnet_npz": str(alex_npz),
        "lpips_lins_npz": str(lins_npz)}))
    assert fn2.metric_key == "lpips"
    out = np.asarray(fn2(jnp.zeros((2, 3, 64, 64, 1)),
                         jnp.ones((2, 3, 64, 64, 1))))
    assert out.shape == (3,) and np.all(np.isfinite(out))
