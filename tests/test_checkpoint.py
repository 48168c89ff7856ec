import jax
import jax.numpy as jnp
import numpy as np

from ode_rl_tpu.core.checkpoint import CheckpointManager


def _state(v):
    return {"params": {"w": jnp.full((3, 3), v), "b": jnp.zeros(3)},
            "opt_state": {"mu": jnp.full((3, 3), v * 0.1)}}


def test_save_restore_roundtrip(tmp_path):
    mgr = CheckpointManager(tmp_path, tag="t")
    mgr.save(100, _state(1.0))
    mgr.save(200, _state(2.0))
    restored = mgr.restore(_state(0.0))
    assert restored["step"] == 200
    np.testing.assert_allclose(np.asarray(restored["state"]["params"]["w"]), 2.0)


def test_restore_specific_step(tmp_path):
    mgr = CheckpointManager(tmp_path, tag="t")
    mgr.save(100, _state(1.0))
    mgr.save(200, _state(2.0))
    restored = mgr.restore(_state(0.0), step=100)
    np.testing.assert_allclose(np.asarray(restored["state"]["params"]["w"]), 1.0)


def test_gc_keeps_latest(tmp_path):
    mgr = CheckpointManager(tmp_path, tag="t", keep=2)
    for s in (1, 2, 3, 4):
        mgr.save(s, _state(float(s)))
    assert mgr.all_steps() == [3, 4]


def test_latest_none_when_empty(tmp_path):
    mgr = CheckpointManager(tmp_path, tag="t")
    assert mgr.latest_step() is None
