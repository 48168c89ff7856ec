"""LPIPS perceptual metric (net-lin / alex).

Capability parity with the reference's vendored LPIPS stack
(/root/reference/Vid-ODE/eval_models/*, the net-lin AlexNet variant used
by dist_model.py): AlexNet conv features at 5 taps, unit-normalized per
channel, squared differences reduced by learned 1×1 linear weights and
spatially averaged.

Weights: the image is zero-egress, so pretrained AlexNet/linear weights
cannot be downloaded. ``LPIPS.load_torch_weights`` ingests the standard
torchvision AlexNet state dict + LPIPS linear weights from .npz/.pth
files when provided; without them the metric runs with random features
(still a valid perceptual-style distance for *relative* comparisons, but
not calibrated to the published LPIPS scale — callers are warned once).
"""

from __future__ import annotations

import warnings
from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

_ALEX_PLAN = [  # (features, kernel, stride, padding)
    (64, 11, 4, 2),
    (192, 5, 1, 2),
    (384, 3, 1, 1),
    (256, 3, 1, 1),
    (256, 3, 1, 1),
]
_POOL_AFTER = {0, 1}  # maxpool after taps 0 and 1 (AlexNet topology)


class _AlexFeatures(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Sequence[jnp.ndarray]:
        taps = []
        for i, (f, k, s, p) in enumerate(_ALEX_PLAN):
            x = nn.Conv(f, (k, k), strides=(s, s), padding=p,
                        dtype=self.dtype, name=f"conv{i}")(x)
            x = jax.nn.relu(x)
            taps.append(x)
            if i in _POOL_AFTER:
                x = nn.max_pool(x, (3, 3), strides=(2, 2))
        return taps


class LPIPS(nn.Module):
    """Learned perceptual distance; __call__(img1, img2) → (B,) scores.

    Images are (B, H, W, 3) in [0, 1] (converted to the [-1, 1], imagenet-
    scaled space internally, like the reference's net-lin wrapper)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, img1: jnp.ndarray, img2: jnp.ndarray) -> jnp.ndarray:
        shift = jnp.asarray([-0.030, -0.088, -0.188], self.dtype)
        scale = jnp.asarray([0.458, 0.448, 0.450], self.dtype)
        norm_in = lambda im: (im * 2.0 - 1.0 - shift) / scale

        net = _AlexFeatures(dtype=self.dtype, name="alex")
        f1 = net(norm_in(img1))
        f2 = net(norm_in(img2))

        total = 0.0
        for i, (a, b) in enumerate(zip(f1, f2)):
            na = a / (jnp.linalg.norm(a, axis=-1, keepdims=True) + 1e-10)
            nb = b / (jnp.linalg.norm(b, axis=-1, keepdims=True) + 1e-10)
            diff2 = (na - nb) ** 2
            lin = self.param(f"lin{i}", nn.initializers.ones,
                             (diff2.shape[-1],), self.dtype)
            weighted = jnp.sum(diff2 * jnp.abs(lin), axis=-1)
            total = total + jnp.mean(weighted, axis=(1, 2))
        return total


_WARNED = [False]


def lpips_distance(variables, img1: jnp.ndarray, img2: jnp.ndarray,
                   calibrated: bool = False) -> jnp.ndarray:
    """Functional wrapper; warns once when running uncalibrated."""
    if not calibrated and not _WARNED[0]:
        warnings.warn(
            "LPIPS running with random (uncalibrated) features — valid "
            "for relative comparisons only. Provide pretrained weights "
            "via LPIPS.load_torch_weights for published-scale scores.")
        _WARNED[0] = True
    model = LPIPS()
    return model.apply(variables, img1, img2)


def init_lpips(key=None):
    model = LPIPS()
    key = key if key is not None else jax.random.key(0)
    dummy = jnp.zeros((1, 64, 64, 3))
    return model.init(key, dummy, dummy)


def load_torch_weights(variables, alexnet_npz: str,
                       lins_npz: Optional[str] = None):
    """Load converted torchvision AlexNet conv weights (and optional
    LPIPS linear weights) from .npz files with keys 'conv{i}_w/b' in
    OIHW layout and 'lin{i}'."""
    import flax
    data = np.load(alexnet_npz)
    params = flax.core.unfreeze(variables)["params"]
    for i in range(len(_ALEX_PLAN)):
        w = data[f"conv{i}_w"]             # (O, I, kH, kW)
        params["alex"][f"conv{i}"]["kernel"] = jnp.asarray(
            w.transpose(2, 3, 1, 0))       # → (kH, kW, I, O)
        params["alex"][f"conv{i}"]["bias"] = jnp.asarray(data[f"conv{i}_b"])
    if lins_npz:
        lins = np.load(lins_npz)
        for i in range(len(_ALEX_PLAN)):
            params[f"lin{i}"] = jnp.asarray(lins[f"lin{i}"]).reshape(-1)
    return {"params": params}
