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


def test_find_checkpoint_by_ckpt_id(tmp_path):
    """Test-time resolution goes by explicit ckpt_id scan, not id-string
    surgery (reference helpers/utils.py:229-252 semantics)."""
    from ode_rl_tpu.core.checkpoint import find_checkpoint

    d = tmp_path / "ConvGRU" / "weird_run_name_42" / "checkpoints"
    mgr = CheckpointManager(d, tag="my_ckpt_id")
    mgr.save(7, {"w": jnp.ones((2,))}, config={"lr": 1e-3, "model": "ConvGRU"})
    found = find_checkpoint(tmp_path, "ConvGRU", "my_ckpt_id")
    assert found == d
    mgr2 = CheckpointManager(found, tag="my_ckpt_id")
    assert mgr2.latest_step() == 7
    assert mgr2.load_config()["model"] == "ConvGRU"


def test_find_checkpoint_missing_fails_loudly(tmp_path):
    from ode_rl_tpu.core.checkpoint import find_checkpoint

    d = tmp_path / "ConvGRU" / "run" / "checkpoints"
    CheckpointManager(d, tag="other_id").save(1, {"w": jnp.ones((2,))})
    try:
        find_checkpoint(tmp_path, "ConvGRU", "no_such_id")
    except FileNotFoundError as e:
        assert "no_such_id" in str(e)
    else:
        raise AssertionError("expected FileNotFoundError")


def test_find_checkpoint_latest_across_dirs(tmp_path):
    from ode_rl_tpu.core.checkpoint import find_checkpoint

    d1 = tmp_path / "M" / "run_a" / "checkpoints"
    d2 = tmp_path / "M" / "run_b" / "checkpoints"
    CheckpointManager(d1, tag="t").save(5, {"w": jnp.ones((2,))})
    CheckpointManager(d2, tag="t").save(9, {"w": jnp.ones((2,))})
    assert find_checkpoint(tmp_path, "M", "t") == d2


def test_restore_gan_snapshot_subset(tmp_path):
    """test() restores only the generator from adversarial snapshots
    ({gen_params, disc_params}): a template naming a subset of the
    snapshot's top-level fields restores cleanly (extra snapshot fields
    are ignored)."""
    from ode_rl_tpu.core.checkpoint import CheckpointManager

    ckpt = CheckpointManager(tmp_path, tag="gan")
    gen = {"dense": {"kernel": np.ones((2, 2), np.float32)}}
    stats = {"batch_stats": {"bn": {"mean": np.full((4,), 0.7, np.float32)}}}
    disc = {"image": {"kernel": np.zeros((3,), np.float32)}}
    ckpt.save(7, {"gen_params": gen, "gen_model_state": stats,
                  "disc_params": disc})

    out = ckpt.restore(
        {"gen_params": {"dense": {"kernel": np.zeros((2, 2), np.float32)}},
         "gen_model_state": {"batch_stats": {"bn": {
             "mean": np.zeros((4,), np.float32)}}}},
        allow_missing=("gen_model_state",))
    assert out["step"] == 7
    np.testing.assert_array_equal(
        out["state"]["gen_params"]["dense"]["kernel"], 1.0)
    # the generator's mutable state (BatchNorm running stats) restores too
    np.testing.assert_allclose(
        out["state"]["gen_model_state"]["batch_stats"]["bn"]["mean"],
        np.float32(0.7))

    # legacy GAN snapshots without gen_model_state degrade gracefully
    ckpt2 = CheckpointManager(tmp_path / "old", tag="gan")
    ckpt2.save(3, {"gen_params": gen, "disc_params": disc})
    out2 = ckpt2.restore(
        {"gen_params": {"dense": {"kernel": np.zeros((2, 2), np.float32)}},
         "gen_model_state": {"batch_stats": {"bn": {
             "mean": np.zeros((4,), np.float32)}}}},
        allow_missing=("gen_model_state",))
    np.testing.assert_array_equal(
        out2["state"]["gen_model_state"]["batch_stats"]["bn"]["mean"], 0.0)
