"""Profiling and tracing utilities.

Capability parity with the reference's observability stubs (SURVEY §5.1:
Vid-ODE's Tracker intermediate-tensor recorder, wall-clock elapsed
logging, per-layer timing stubs) — upgraded to TPU-native tooling:
``jax.profiler`` trace capture around training steps, a step timer with
percentile reporting, and a Tracker with the reference's
write/export/clean API.
"""

from __future__ import annotations

import contextlib
import pathlib
import time
from typing import Any, Dict, List, Optional

import numpy as np


class Tracker:
    """Intermediate-tensor recorder (reference Vid-ODE/utils.py:15-27:
    write_info / export_info / clean_info)."""

    def __init__(self):
        self.infos: Dict[str, Any] = {}

    def write_info(self, key: str, value: Any) -> None:
        self.infos[key] = value

    def export_info(self) -> Dict[str, Any]:
        return dict(self.infos)

    def clean_info(self) -> None:
        self.infos = {}


class StepTimer:
    """Wall-clock step timing with percentile summary (replaces the
    reference's ad-hoc time.time() deltas)."""

    def __init__(self, warmup: int = 3):
        self.warmup = warmup
        self._times: List[float] = []
        self._count = 0
        self._last: Optional[float] = None

    def tick(self) -> None:
        now = time.perf_counter()
        if self._last is not None:
            self._count += 1
            if self._count > self.warmup:
                self._times.append(now - self._last)
        self._last = now

    def summary(self) -> Dict[str, float]:
        if not self._times:
            return {}
        arr = np.asarray(self._times)
        return {
            "mean_ms": float(arr.mean() * 1e3),
            "p50_ms": float(np.percentile(arr, 50) * 1e3),
            "p95_ms": float(np.percentile(arr, 95) * 1e3),
            "steps_per_sec": float(1.0 / arr.mean()),
        }


@contextlib.contextmanager
def trace(logdir, enabled: bool = True):
    """Capture a jax.profiler trace (open with TensorBoard/Perfetto)."""
    if not enabled:
        yield
        return
    import jax

    logdir = pathlib.Path(logdir)
    logdir.mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(str(logdir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named trace annotation for profiler timelines."""
    import jax

    return jax.profiler.TraceAnnotation(name)
