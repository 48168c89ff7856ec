#!/usr/bin/env python
"""Micro-benchmark of Moving MNIST sprite-placement strategies on TPU.

The fused train step spends ~44 ms (half the step) in on-device data
generation at batch 128 × 20 frames × 3 digits; this compares placement
implementations to pick the fastest (see PROFILE notes in BASELINE.md).
"""

from __future__ import annotations

import pathlib
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

B, T, D = 128, 20, 3
IMG, SPR = 64, 28
P = B * T * D


def timeit(fn, *args, n=20, name=""):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / n)
    print(f"{name:40s} {best * 1e3:8.3f} ms")
    return out


def main():
    key = jax.random.key(0)
    sprites = jax.random.uniform(key, (P, SPR, SPR), jnp.float32) * 255
    tops = jax.random.randint(jax.random.key(1), (P,), 0, IMG - SPR)
    lefts = jax.random.randint(jax.random.key(2), (P,), 0, IMG - SPR)
    print("device:", jax.devices()[0], " placements:", P)

    # A: flat vmap dynamic_update_slice (current strategy, flattened)
    @jax.jit
    def dus(sprites, tops, lefts):
        def place(s, t, l):
            canvas = jnp.zeros((IMG, IMG), s.dtype)
            return jax.lax.dynamic_update_slice(canvas, s, (t, l))
        out = jax.vmap(place)(sprites, tops, lefts)
        return jnp.max(out.reshape(B, T, D, IMG, IMG), axis=2)
    a = timeit(dus, sprites, tops, lefts, name="vmap dynamic_update_slice")

    # B: one-hot two-sided batched matmul
    @jax.jit
    def onehot_mm(sprites, tops, lefts):
        iy = jax.lax.broadcasted_iota(jnp.int32, (IMG, SPR), 0)
        ia = jax.lax.broadcasted_iota(jnp.int32, (IMG, SPR), 1)
        ohy = (iy[None] == tops[:, None, None] + ia[None]).astype(jnp.float32)
        ohx = (iy[None] == lefts[:, None, None] + ia[None]).astype(jnp.float32)
        tmp = jnp.einsum("pya,pab->pyb", ohy, sprites,
                         preferred_element_type=jnp.float32)
        out = jnp.einsum("pyb,pxb->pyx", tmp, ohx,
                         preferred_element_type=jnp.float32)
        return jnp.max(out.reshape(B, T, D, IMG, IMG), axis=2)
    b = timeit(onehot_mm, sprites, tops, lefts, name="one-hot batched matmul")

    # C: pad to 64×64 then dynamic roll (two slice+concat per axis)
    @jax.jit
    def padroll(sprites, tops, lefts):
        big = jnp.pad(sprites, ((0, 0), (0, IMG - SPR), (0, IMG - SPR)))

        def roll2(img, t, l):
            return jnp.roll(img, (t, l), (0, 1))
        out = jax.vmap(roll2)(big, tops, lefts)
        return jnp.max(out.reshape(B, T, D, IMG, IMG), axis=2)
    c = timeit(padroll, sprites, tops, lefts, name="pad + dynamic roll")

    # D: gather rows then columns (take_along_axis with clipped indices)
    @jax.jit
    def gather2(sprites, tops, lefts):
        big = jnp.pad(sprites, ((0, 0), (0, IMG - SPR), (0, IMG - SPR)))
        iy = jax.lax.broadcasted_iota(jnp.int32, (P, IMG), 1)
        ry = jnp.mod(iy - tops[:, None], IMG)
        rx = jnp.mod(iy - lefts[:, None], IMG)
        out = jnp.take_along_axis(big, ry[:, :, None], axis=1)
        out = jnp.take_along_axis(out, rx[:, None, :], axis=2)
        return jnp.max(out.reshape(B, T, D, IMG, IMG), axis=2)
    d = timeit(gather2, sprites, tops, lefts, name="mod-index gather rows/cols")

    import numpy as np
    for name, o in [("onehot", b), ("padroll", c), ("gather", d)]:
        np.testing.assert_allclose(np.asarray(o), np.asarray(a), atol=1e-4)
        print(f"  {name} matches dynamic_update_slice")


if __name__ == "__main__":
    main()
