"""Every experiment block must merge cleanly and build its model."""

import pathlib

import pytest
import yaml

from ode_rl_tpu.core.config import load_config
from ode_rl_tpu.models import build_model

CFG_PATH = pathlib.Path(__file__).resolve().parents[1] / "configs.yaml"
BLOCKS = [k for k in yaml.safe_load(CFG_PATH.read_text()) if k != "defaults"]


@pytest.mark.parametrize("block", BLOCKS)
def test_block_merges_and_builds(block):
    cfg = load_config(["defaults", block], CFG_PATH)
    # critical numeric fields must have parsed as numbers (the YAML
    # `1e-4`-is-a-string trap)
    assert isinstance(cfg.lr, float)
    assert isinstance(cfg.get("odeint_rtol"), float)
    assert isinstance(cfg.get("clip"), (int, float))
    model = build_model(cfg)  # registry dispatch must succeed
    assert model is not None


def test_cli_parse_roundtrip():
    """main.get_cfg must parse `--configs` + typed overrides."""
    import sys
    sys.path.insert(0, str(CFG_PATH.parent))
    from main import get_cfg

    cfg = get_cfg(["--configs", "defaults", "train_mmnist_cgru_len20",
                   "--epochs", "3", "--lr", "2e-4", "--off_wandb", "True"])
    assert cfg.epochs == 3
    assert cfg.lr == 2e-4
    assert cfg.off_wandb is True
    assert cfg.train_in_seq == 10
