"""ctypes bridge to the native (C++/OpenMP) Moving MNIST generator.

Builds ``native/mmnist_gen.cc`` into a shared library on first use
(g++ -O3 -fopenmp) and exposes ``generate_batch``. This is the host-side
native data path — used to pre-materialize frozen datasets and to feed
non-JAX consumers; the training hot path generates on device
(data/mmnist.py). Falls back to a NumPy implementation if no compiler
is available.
"""

from __future__ import annotations

import ctypes
import pathlib
import subprocess
from typing import Optional

import numpy as np

_REPO = pathlib.Path(__file__).resolve().parents[2]
_SRC = _REPO / "native" / "mmnist_gen.cc"
_LIB = _REPO / "native" / "libmmnist_gen.so"

_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _ensure_built() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    try:
        if (not _LIB.exists()
                or _LIB.stat().st_mtime < _SRC.stat().st_mtime):
            subprocess.run(
                ["g++", "-O3", "-march=native", "-fopenmp", "-shared",
                 "-fPIC", str(_SRC), "-o", str(_LIB)],
                check=True, capture_output=True)
        lib = ctypes.CDLL(str(_LIB))
        lib.mmnist_generate.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_uint64,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.mmnist_generate.restype = None
        _lib = lib
    except Exception:
        _build_failed = True
    return _lib


def _numpy_fallback(sprites, seed, batch, n_frames, num_digits):
    """Same physics in NumPy (different PRNG stream than the C++ one)."""
    rng = np.random.RandomState(seed & 0x7FFFFFFF)
    out = np.zeros((batch, n_frames, 64, 64), np.uint8)
    canvas = 64 - 28
    for b in range(batch):
        for _ in range(num_digits):
            x, y = rng.rand(), rng.rand()
            theta = rng.rand() * 2 * np.pi
            vy, vx = np.sin(theta), np.cos(theta)
            sp = sprites[rng.randint(len(sprites))]
            t = np.arange(1, n_frames + 1)
            ref = lambda v: 1.0 - np.abs(np.mod(v, 2.0) - 1.0)
            tops = (ref(y + vy * 0.1 * t) * canvas).astype(np.int32)
            lefts = (ref(x + vx * 0.1 * t) * canvas).astype(np.int32)
            for i in range(n_frames):
                r0, c0 = tops[i], lefts[i]
                region = out[b, i, r0:r0 + 28, c0:c0 + 28]
                np.maximum(region, sp, out=region)
    return out


def generate_batch(sprites: np.ndarray, seed: int, batch: int,
                   n_frames: int, num_digits: int = 2) -> np.ndarray:
    """(batch, n_frames, 64, 64) uint8 frames; native if buildable."""
    sprites = np.ascontiguousarray(sprites, np.uint8)
    lib = _ensure_built()
    if lib is None:
        return _numpy_fallback(sprites, seed, batch, n_frames, num_digits)
    out = np.zeros((batch, n_frames, 64, 64), np.uint8)
    lib.mmnist_generate(
        sprites.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        len(sprites), ctypes.c_uint64(seed), batch, n_frames, num_digits,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out


def using_native() -> bool:
    return _ensure_built() is not None
