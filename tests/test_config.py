import pathlib

import pytest

from ode_rl_tpu.core.config import Config, coerce, load_config, resolve_run_id

CFG_PATH = pathlib.Path(__file__).resolve().parents[1] / "configs.yaml"


def test_merge_order():
    cfg = load_config(["defaults", "train_mmnist_cgru_len20"], CFG_PATH)
    assert cfg.train_in_seq == 10          # overridden by the experiment
    assert cfg.batch_size == 4             # from defaults
    assert cfg.model == "ConvGRU"


def test_unknown_block_raises():
    with pytest.raises(KeyError):
        load_config(["defaults", "nope"], CFG_PATH)


def test_coercion():
    assert coerce(True, "False") is False
    assert coerce(1, "2") == 2
    assert coerce(1, "1e-4") == 1e-4       # int default, scientific → float
    assert coerce(2.0, "3") == 3.0
    assert coerce((1, 2), "3,4") == (3, 4)


def test_overrides_typed():
    cfg = load_config(["defaults"], CFG_PATH, overrides={"epochs": "3"})
    assert cfg.epochs == 3


def test_config_hashable_and_immutable():
    cfg = load_config(["defaults"], CFG_PATH)
    hash(cfg)
    with pytest.raises(AttributeError):
        cfg.epochs = 1
    assert cfg.replace(epochs=1).epochs == 1


def test_run_id():
    cfg = Config({"phase": "train", "id": "x", "train_in_seq": 10,
                  "train_out_seq": 10, "test_in_seq": 1, "test_out_seq": 2})
    assert resolve_run_id(cfg) == "x_10_10"
