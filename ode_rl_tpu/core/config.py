"""Layered YAML config system with typed command-line overrides.

Capability parity with the reference's config stack (the reference merges
named YAML blocks left-to-right and turns every key into a typed ``--flag``;
see /root/reference/main.py:25-51 and /root/reference/helpers/utils.py:9-24).
This is a fresh implementation: configs resolve to an immutable ``Config``
dataclass-like mapping with attribute access, suitable for hashing into
jit-static arguments.
"""

from __future__ import annotations

import argparse
import pathlib
from typing import Any, Dict, Iterable, Mapping, Optional

import yaml


class Config(Mapping):
    """Immutable attribute-accessible mapping.

    Hashable so it can be closed over / passed as a static argument to
    jitted functions.
    """

    def __init__(self, entries: Dict[str, Any]):
        object.__setattr__(self, "_entries", dict(entries))

    # -- mapping protocol -------------------------------------------------
    def __getitem__(self, key: str) -> Any:
        return self._entries[key]

    def __iter__(self):
        return iter(self._entries)

    def __len__(self) -> int:
        return len(self._entries)

    # -- attribute access -------------------------------------------------
    def __getattr__(self, key: str) -> Any:
        try:
            return self._entries[key]
        except KeyError as e:
            raise AttributeError(f"Config has no key {key!r}") from e

    def __setattr__(self, key: str, value: Any) -> None:
        raise AttributeError("Config is immutable; use .replace(**kw)")

    def replace(self, **kw: Any) -> "Config":
        entries = dict(self._entries)
        entries.update(kw)
        return Config(entries)

    def get(self, key: str, default: Any = None) -> Any:
        return self._entries.get(key, default)

    def __hash__(self) -> int:
        return hash(tuple(sorted((k, _hashable(v)) for k, v in self._entries.items())))

    def __eq__(self, other: object) -> bool:
        return isinstance(other, Config) and self._entries == other._entries

    def __repr__(self) -> str:
        body = ", ".join(f"{k}={v!r}" for k, v in sorted(self._entries.items()))
        return f"Config({body})"

    def to_dict(self) -> Dict[str, Any]:
        return dict(self._entries)


def _hashable(v: Any) -> Any:
    if isinstance(v, list):
        return tuple(v)
    if isinstance(v, dict):
        return tuple(sorted(v.items()))
    return v


def coerce(default: Any, text: str) -> Any:
    """Coerce a CLI string to the type of ``default``.

    Same contract as the reference's string→typed-flag coercion
    (bool parsed from 'True'/'False', int promoted to float when the
    string looks scientific, comma-separated tuples).
    """
    if default is None:
        return text
    if isinstance(default, bool):
        if text not in ("True", "False", "true", "false", "1", "0"):
            raise argparse.ArgumentTypeError(f"expected bool, got {text!r}")
        return text in ("True", "true", "1")
    if isinstance(default, int) and not isinstance(default, bool):
        return float(text) if ("e" in text or "." in text) else int(text)
    if isinstance(default, float):
        return float(text)
    if isinstance(default, (list, tuple)):
        elem_default = default[0] if len(default) else ""
        return tuple(coerce(elem_default, y) for y in text.split(","))
    return type(default)(text)


def load_config(
    names: Iterable[str],
    config_path: Optional[pathlib.Path] = None,
    overrides: Optional[Dict[str, Any]] = None,
) -> Config:
    """Merge named YAML blocks left-to-right, then apply overrides."""
    if config_path is None:
        config_path = pathlib.Path(__file__).resolve().parents[2] / "configs.yaml"
    blocks = yaml.safe_load(pathlib.Path(config_path).read_text())
    merged: Dict[str, Any] = {}
    for name in names:
        if name not in blocks:
            raise KeyError(
                f"no config block named {name!r} in {config_path} "
                f"(available: {sorted(blocks)})"
            )
        merged.update(blocks[name])
    if overrides:
        for k, v in overrides.items():
            if k in merged and isinstance(v, str):
                merged[k] = coerce(merged[k], v)
            else:
                merged[k] = v
    return Config(merged)


def add_cli_overrides(cfg_defaults: Dict[str, Any], argv) -> Dict[str, Any]:
    """Parse ``--key value`` overrides typed against the merged defaults."""
    parser = argparse.ArgumentParser(allow_abbrev=False)
    for key, value in sorted(cfg_defaults.items()):
        parser.add_argument(
            f"--{key}",
            type=lambda x, d=value: coerce(d, x) if isinstance(x, str) else x,
            default=value,
        )
    ns = parser.parse_args(argv)
    return vars(ns)


def resolve_run_id(cfg: Config) -> str:
    """Derive the experiment id like the reference does (id + in/out seq)."""
    if cfg.get("phase", "train") == "train":
        return f"{cfg.id}_{cfg.train_in_seq}_{cfg.train_out_seq}"
    return f"{cfg.id}_{cfg.test_in_seq}_{cfg.test_out_seq}"
