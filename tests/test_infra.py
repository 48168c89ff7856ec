"""Tests for native generator, frozen dataset, schedulers, debug tools."""

import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ode_rl_tpu.core.debug import all_finite, checked_odeint, nan_guard_update
from ode_rl_tpu.core.profiler import StepTimer, Tracker
from ode_rl_tpu.data.native_gen import generate_batch, using_native
from ode_rl_tpu.data.sprites import get_sprite_bank
from ode_rl_tpu.train.schedulers import (
    EarlyStopping, ReduceLROnPlateau, exponential_epoch_decay)


# ----------------------------- native generator ----------------------------

def test_native_generator_builds_and_runs():
    bank = get_sprite_bank()
    out = generate_batch(bank, seed=7, batch=3, n_frames=5, num_digits=2)
    assert out.shape == (3, 5, 64, 64)
    assert out.dtype == np.uint8
    assert out.max() > 100
    assert (out[:, 1] != out[:, 0]).any()  # digits move


def test_native_generator_deterministic():
    bank = get_sprite_bank()
    a = generate_batch(bank, seed=3, batch=2, n_frames=4)
    b = generate_batch(bank, seed=3, batch=2, n_frames=4)
    c = generate_batch(bank, seed=4, batch=2, n_frames=4)
    np.testing.assert_array_equal(a, b)
    assert (a != c).any()


# ------------------------------ frozen dataset -----------------------------

def test_frozen_roundtrip(tmp_path):
    subprocess.run(
        [sys.executable, "scripts/make_frozen_mmnist.py",
         "--out", str(tmp_path), "--videos", "10", "--frames", "20",
         "--shard_size", "5"],
        check=True, capture_output=True)
    from ode_rl_tpu.data.frozen import FrozenMovingMNIST
    loader = iter(FrozenMovingMNIST(tmp_path, batch_size=3,
                                    n_frames_input=4, n_frames_output=4))
    v = next(loader)
    assert v.shape == (3, 8, 64, 64, 1)
    assert float(v.min()) >= -0.5 and float(v.max()) <= 0.5
    # test split exists too
    iter(FrozenMovingMNIST(tmp_path, batch_size=1, n_frames_input=4,
                           n_frames_output=0, is_train=False))


# ------------------------------- schedulers --------------------------------

def test_exponential_epoch_decay():
    sched = exponential_epoch_decay(1.0, decay=0.5, steps_per_epoch=10,
                                    lowest=0.1)
    assert float(sched(0)) == 1.0
    assert float(sched(10)) == 0.5
    assert float(sched(100)) == pytest.approx(0.1)  # floor


def test_reduce_lr_on_plateau():
    sched = ReduceLROnPlateau(factor=0.5, patience=1)
    assert sched.step(1.0) == 1.0     # improvement (first)
    assert sched.step(0.5) == 1.0     # improvement
    assert sched.step(0.6) == 1.0     # bad 1 (within patience)
    assert sched.step(0.6) == 0.5     # bad 2 → decay
    assert sched.step(0.1) == 0.5     # improvement keeps scale


def test_early_stopping():
    es = EarlyStopping(patience=2)
    assert not es.step(1.0)
    assert not es.step(0.9)
    assert not es.step(0.95)
    assert es.step(0.95)
    assert es.should_stop


@pytest.mark.slow
def test_plateau_lr_scale_wired_into_train_state():
    """lr_scheduler: plateau puts a host-settable scale in opt_state; the
    same jitted step then takes a smaller parameter step (no recompile)."""
    import jax

    from ode_rl_tpu.core.config import Config
    from ode_rl_tpu.train.schedulers import set_lr_scale
    from ode_rl_tpu.train.step import create_train_state, make_train_step
    from ode_rl_tpu.data import MovingMNIST, make_batch_dict
    from ode_rl_tpu.models.convgru import ConvGRUModel

    cfg = Config({"lr": 1e-3, "clip": -1, "lr_scheduler": "plateau",
                  "optimizer": "adamax"})
    model = ConvGRUModel(in_channels=1, conv_encoder_out_ch=8,
                         convgru_out_ch=8)
    loader = iter(MovingMNIST(batch_size=2, n_frames_input=2,
                              n_frames_output=2))
    batch = make_batch_dict(next(loader), n_in=2)
    state = create_train_state(model, cfg, batch, jax.random.key(0))
    step = make_train_step(model, donate=False)

    def delta(s):
        s2, _ = step(s, batch, jax.random.key(1))
        flat = jax.tree_util.tree_leaves(
            jax.tree_util.tree_map(lambda a, b: jnp.abs(a - b).sum(),
                                   s2.params, s.params))
        return float(sum(jnp.asarray(x) for x in flat))

    full = delta(state)
    half = delta(set_lr_scale(state, 0.5))
    assert half == pytest.approx(full * 0.5, rel=1e-3)
    zero = delta(set_lr_scale(state, 0.0))
    assert zero == pytest.approx(0.0, abs=1e-9)


# ------------------------------- debug tools -------------------------------

def test_all_finite_and_nan_guard():
    good = {"w": jnp.ones(3)}
    bad = {"w": jnp.array([1.0, jnp.nan, 2.0])}
    assert bool(all_finite(good))
    assert not bool(all_finite(bad))
    guarded, skipped = nan_guard_update(
        {"w": jnp.zeros(3)}, {"w": jnp.ones(3)}, bad)
    np.testing.assert_array_equal(np.asarray(guarded["w"]), 0.0)
    assert int(skipped) == 1
    guarded2, skipped2 = nan_guard_update(
        {"w": jnp.zeros(3)}, {"w": jnp.ones(3)}, good)
    np.testing.assert_array_equal(np.asarray(guarded2["w"]), 1.0)
    assert int(skipped2) == 0


def test_checked_odeint_flags_nan_dynamics():
    from jax.experimental import checkify

    def bad_field(t, y):
        return y * jnp.nan

    fn = checkify.checkify(
        lambda y0: checked_odeint(bad_field, y0, jnp.linspace(0, 1, 3),
                                  method="euler"))
    err, _ = fn(jnp.ones(2))
    with pytest.raises(Exception):
        err.throw()


def test_checked_odeint_clean_path():
    from jax.experimental import checkify

    fn = checkify.checkify(
        lambda y0: checked_odeint(lambda t, y: -y, y0,
                                  jnp.linspace(0, 1, 3), method="euler"))
    err, (ys, stats) = fn(jnp.ones(2))
    err.throw()  # no error
    assert ys.shape == (3, 2)


# ----------------------- run plotting vs baselines -------------------------

def test_plot_runs_against_baseline_curves(tmp_path):
    """plot_runs aggregates metrics.jsonl runs and overlays baseline score
    records in the reference's schema (dreamerv2/scores/*.json,
    plotting.py bin/aggregate pipeline)."""
    import json

    for seed in (0, 1):
        run = tmp_path / "logs" / "ODEConv" / f"exp_seed{seed}"
        run.mkdir(parents=True)
        rows = [{"step": s, "loss": 1.0 / (s + 1) + 0.1 * seed}
                for s in range(0, 100, 10)]
        (run / "metrics.jsonl").write_text(
            "\n".join(json.dumps(r) for r in rows))
    scores = [{"task": "ODEConv", "method": "published", "seed": str(s),
               "xs": list(range(0, 100, 10)),
               "ys": [0.5 / (x + 1) for x in range(0, 100, 10)]}
              for s in (0, 1)]
    score_file = tmp_path / "published.json"
    score_file.write_text(json.dumps(scores))
    out = tmp_path / "cmp.png"
    subprocess.run(
        [sys.executable, "scripts/plot_runs.py", "--logs",
         str(tmp_path / "logs"), "--metric", "loss", "--baselines",
         str(score_file), "--bins", "5", "--out", str(out)],
        check=True, capture_output=True)
    assert out.exists() and out.stat().st_size > 1000

    # unit-level: seeds aggregate into one (task, method) curve with std
    sys.path.insert(0, "scripts")
    import plot_runs as pr
    records = pr.load_run_records(tmp_path / "logs", "loss")
    records += pr.load_baseline_records([score_file])
    curves = pr.aggregate(records, bins=5)
    assert ("ODEConv", "exp") in curves and ("ODEConv", "published") in curves
    exp = curves[("ODEConv", "exp")]
    mean, band = exp["mid"], exp["hi"] - exp["lo"]
    assert np.isfinite(mean).all() and (band > 0).any()  # 2 seeds differ
    # median mode yields a 20/80 percentile band on the same bins
    med = pr.aggregate(records, bins=5, mode="median")[("ODEConv", "exp")]
    assert np.allclose(med["xs"], exp["xs"])
    assert (med["hi"] >= med["lo"]).all()


# ------------------------------- profiler ----------------------------------

def test_tracker_api():
    tr = Tracker()
    tr.write_info("x", 1)
    assert tr.export_info() == {"x": 1}
    tr.clean_info()
    assert tr.export_info() == {}


def test_step_timer():
    import time

    t = StepTimer(warmup=1)
    for _ in range(5):
        t.tick()
        time.sleep(0.001)
    s = t.summary()
    assert s["mean_ms"] > 0
    assert "p95_ms" in s
