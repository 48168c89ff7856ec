"""Unified checkpoint manager.

Replaces the reference's three ad-hoc schemes (step-stamped training
pickles, Vid-ODE ``ckpt_{step}.pth`` state-dict dumps, and Dreamer's
``variables.pkl``) with one manager that saves params + optimizer state +
step + PRNG key + config snapshot, step-stamped, with auto-resume from the
latest checkpoint. Serialization is flax msgpack (no pickle of arbitrary
code).
"""

from __future__ import annotations

import json
import os
import pathlib
import re
from typing import Any, Dict, Optional

import jax
from flax import serialization

_CKPT_RE = re.compile(r"^(?P<tag>.+)_(?P<step>\d{10})\.ckpt$")


class CheckpointManager:
    def __init__(self, directory: os.PathLike, tag: str = "ckpt", keep: int = 5):
        self.directory = pathlib.Path(directory)
        self.directory.mkdir(parents=True, exist_ok=True)
        self.tag = tag
        self.keep = keep

    def _path(self, step: int) -> pathlib.Path:
        return self.directory / f"{self.tag}_{step:010d}.ckpt"

    def save(self, step: int, state: Dict[str, Any], config: Optional[Dict] = None) -> pathlib.Path:
        """Save a pytree ``state`` at ``step``. Blocks on device→host copy."""
        state = jax.device_get(state)
        payload = serialization.to_bytes({"step": step, "state": state})
        path = self._path(step)
        tmp = path.with_suffix(".tmp")
        tmp.write_bytes(payload)
        tmp.replace(path)  # atomic on POSIX
        if config is not None:
            cfg_path = self.directory / f"{self.tag}_config.json"
            cfg_path.write_text(json.dumps(config, default=str, indent=2))
        self._gc()
        return path

    def _gc(self) -> None:
        ckpts = self.all_steps()
        for step in ckpts[: -self.keep] if self.keep > 0 else []:
            self._path(step).unlink(missing_ok=True)

    def all_steps(self):
        steps = []
        for p in self.directory.glob(f"{self.tag}_*.ckpt"):
            m = _CKPT_RE.match(p.name)
            if m and m.group("tag") == self.tag:
                steps.append(int(m.group("step")))
        return sorted(steps)

    def latest_step(self) -> Optional[int]:
        steps = self.all_steps()
        return steps[-1] if steps else None

    def restore(self, target: Dict[str, Any], step: Optional[int] = None) -> Dict[str, Any]:
        """Restore into the structure of ``target`` (a template pytree).

        Returns ``{"step": int, "state": pytree}``; raises if nothing saved.
        """
        if step is None:
            step = self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {self.directory}")
        payload = self._path(step).read_bytes()
        template = {"step": 0, "state": target}
        return serialization.from_bytes(template, payload)
