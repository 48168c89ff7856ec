#!/usr/bin/env python
"""Timing-methodology probe for bench.py on the axon-tunnel TPU backend.

Question: does ``jax.block_until_ready`` actually wait for remote
execution on this experimental platform, or only for dispatch? The
per-family bench numbers (s3vae 1.43 ms/step => 2000% "MFU") are
physically impossible if the sync is real, so we measure a workload
whose true FLOPs are exactly known — a chained 8192² bf16 matmul — and
compare three sync strategies:

  A. block_until_ready on the final result of the chain (bench.py's);
  B. device_get of one scalar from the final result (host readback —
     cannot complete before the compute);
  C. float() of a full-reduction (forces the value onto the host).

If A reports >100% of peak while B/C agree at a plausible fraction,
block_until_ready is a no-op-ish on this backend and every bench must
sync via readback.
"""

import time

import jax
import jax.numpy as jnp

PEAK = 1.97e14  # v5e bf16


def main():
    n, steps = 4096, 50
    x = jnp.full((n, n), 0.001, jnp.bfloat16)

    @jax.jit
    def f(x):
        y = x @ x
        # keep magnitudes bounded so the chain can't be folded
        return y / jnp.maximum(jnp.max(jnp.abs(y)), 1e-6)

    y = f(x)
    jax.block_until_ready(y)
    flops = steps * 2.0 * n ** 3

    # A: block_until_ready
    y = f(x)
    t0 = time.perf_counter()
    for _ in range(steps):
        y = f(y)
    jax.block_until_ready(y)
    dt_a = time.perf_counter() - t0

    # B: device_get of a scalar slice
    y = f(x)
    t0 = time.perf_counter()
    for _ in range(steps):
        y = f(y)
    _ = jax.device_get(y[0, 0])
    dt_b = time.perf_counter() - t0

    # C: host float of a reduction
    y = f(x)
    t0 = time.perf_counter()
    for _ in range(steps):
        y = f(y)
    _ = float(jnp.sum(y))
    dt_c = time.perf_counter() - t0

    for tag, dt in (("A block_until_ready", dt_a),
                    ("B device_get scalar", dt_b),
                    ("C float(sum)", dt_c)):
        print(f"{tag}: {dt*1e3/steps:8.3f} ms/step  "
              f"{100*flops/dt/PEAK:7.2f}% of bf16 peak")


if __name__ == "__main__":
    main()
