#!/usr/bin/env python
"""CLI entry point.

Same public contract as the reference
(`python main.py --configs defaults train_mmnist_cgru_len20 [--flag value]`,
/root/reference/main.py:25-51): named YAML blocks merge left-to-right and
every resulting key is a typed command-line flag.
"""

from __future__ import annotations

import argparse
import pathlib
import sys

from ode_rl_tpu.core.config import Config, add_cli_overrides, load_config


def get_cfg(argv=None) -> Config:
    argv = sys.argv[1:] if argv is None else argv
    parser = argparse.ArgumentParser(add_help=False)
    parser.add_argument("--configs", nargs="+", required=True)
    args, remaining = parser.parse_known_args(argv)
    cfg_path = pathlib.Path(__file__).parent / "configs.yaml"
    merged = load_config(args.configs, config_path=cfg_path).to_dict()
    final = add_cli_overrides(merged, remaining)
    return Config(final)


def main() -> None:
    cfg = get_cfg()
    from ode_rl_tpu.train.loop import test, train  # deferred: imports jax

    if cfg.phase == "train":
        train(cfg)
    elif cfg.phase == "test":
        test(cfg)
    else:
        raise ValueError(f"unknown phase {cfg.phase!r}")


if __name__ == "__main__":
    main()
