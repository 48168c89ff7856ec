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

    def restore(self, target: Dict[str, Any], step: Optional[int] = None,
                allow_missing=("model_state",)) -> Dict[str, Any]:
        """Restore into the structure of ``target`` (a template pytree).

        Structure-tolerant for *additive* evolution: top-level fields named
        in ``allow_missing`` may be absent from the snapshot (they keep the
        template's fresh values). Any other structural gap — e.g. params
        from a different model architecture — raises, because silently
        training on fresh params while claiming "resumed" corrupts runs.

        Returns ``{"step": int, "state": pytree}``; raises if nothing saved.
        """
        if step is None:
            step = self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {self.directory}")
        payload = self._path(step).read_bytes()
        raw = serialization.msgpack_restore(payload)
        target_sd = serialization.to_state_dict(target)
        merged, missing = _merge_state(target_sd, raw["state"], path="")
        fatal = [p for p in missing
                 if p.split("/")[1] not in allow_missing]
        if fatal:
            raise ValueError(
                f"checkpoint {self._path(step)} is structurally incompatible"
                f" with the current model/optimizer — snapshot lacks: "
                f"{fatal[:8]}{'…' if len(fatal) > 8 else ''}")
        if missing:
            print(f"checkpoint {self._path(step).name}: keeping fresh "
                  f"values for fields absent in snapshot: {missing}")
        state = serialization.from_state_dict(target, merged)
        return {"step": int(raw["step"]), "state": state}

    def load_config(self) -> Optional[Dict[str, Any]]:
        """Return the config snapshot saved alongside the checkpoints
        (the Vid-ODE options.json resurrection pattern,
        reference Vid-ODE/tester.py:17-30), or None if absent."""
        cfg_path = self.directory / f"{self.tag}_config.json"
        if not cfg_path.exists():
            return None
        return json.loads(cfg_path.read_text())


def _merge_state(target, snapshot, path=""):
    """Recursively overlay ``snapshot`` onto ``target`` (both flax state
    dicts); returns (merged, missing_paths). Keys absent from the snapshot
    keep the target's value; extra snapshot keys are ignored."""
    if not isinstance(target, dict) or not isinstance(snapshot, dict):
        return snapshot, []
    merged, missing = {}, []
    for k, v in target.items():
        if k in snapshot:
            sub, sub_missing = _merge_state(v, snapshot[k], f"{path}/{k}")
            merged[k] = sub
            missing.extend(sub_missing)
        else:
            merged[k] = v
            missing.append(f"{path}/{k}")
    return merged, missing


def find_checkpoint(logdir: os.PathLike, model: str,
                    ckpt_id: str) -> pathlib.Path:
    """Locate the checkpoint directory for ``ckpt_id`` by scanning
    ``<logdir>/<model>/*/checkpoints`` for step-stamped files whose tag is
    exactly ``ckpt_id``.

    Mirrors the reference's explicit ckpt_id-based loading
    (/root/reference/helpers/utils.py:229-252) instead of guessing the
    train-run directory from the test id. Raises FileNotFoundError (loudly,
    with the searched pattern and any near-misses) when nothing matches.
    """
    root = pathlib.Path(logdir) / model
    hits = []
    for p in root.glob(f"*/checkpoints/{ckpt_id}_*.ckpt"):
        m = _CKPT_RE.match(p.name)
        if m and m.group("tag") == ckpt_id:
            hits.append(p)
    if not hits:
        available = sorted({q.parent for q in root.glob("*/checkpoints/*.ckpt")})
        raise FileNotFoundError(
            f"no checkpoint with ckpt_id={ckpt_id!r} under {root}/*/checkpoints"
            f" — found checkpoint dirs: {[str(a) for a in available] or 'none'}")
    # Latest step wins across candidate dirs (steps are zero-padded so the
    # lexicographic max is the numeric max).
    return max(hits, key=lambda p: p.name).parent
