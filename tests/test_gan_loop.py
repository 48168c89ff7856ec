"""GAN training loop completeness: the 0.99/epoch LR decay must actually
reach the optimizer, and the loop must run periodic in-training evals with
image dumps (reference Vid-ODE/main.py:214-215, 256-290)."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from ode_rl_tpu.core.config import Config
from ode_rl_tpu.data import MovingMNIST, make_batch_dict
from ode_rl_tpu.models.vidode import VidODEModel
from ode_rl_tpu.train.gan import (
    create_gan_state, make_gan_lr_schedule, make_gan_train_step)


def test_lr_schedule_staircase_per_epoch():
    cfg = Config({"lr": 1e-3, "lr_decay": 0.99})
    sched = make_gan_lr_schedule(cfg, steps_per_epoch=10)
    np.testing.assert_allclose(float(sched(0)), 1e-3, rtol=1e-6)
    np.testing.assert_allclose(float(sched(9)), 1e-3, rtol=1e-6)  # epoch 0
    np.testing.assert_allclose(float(sched(10)), 1e-3 * 0.99, rtol=1e-6)
    np.testing.assert_allclose(float(sched(35)), 1e-3 * 0.99 ** 3, rtol=1e-6)


def test_lr_schedule_disabled():
    cfg = Config({"lr": 1e-3, "lr_decay": 1.0})
    sched = make_gan_lr_schedule(cfg, steps_per_epoch=10)
    np.testing.assert_allclose(float(sched(1000)), 1e-3, rtol=1e-6)


@pytest.mark.slow
def test_gan_step_decays_lr_into_optimizer():
    """The schedule must be wired into the Adamax chain, not just logged:
    after steps_per_epoch steps the applied LR (telemetry) drops 0.99×."""
    n_in, n_out = 3, 2
    loader = iter(MovingMNIST(batch_size=2, n_frames_input=n_in,
                              n_frames_output=n_out))
    batch = make_batch_dict(next(loader), n_in=n_in)
    model = VidODEModel(in_channels=1, n_downs=2, base_ch=8, n_layers=1,
                        ode_max_steps=16)
    cfg = Config({"lr": 1e-3, "lr_decay": 0.99})
    steps_per_epoch = 2
    sched = make_gan_lr_schedule(cfg, steps_per_epoch)
    state = create_gan_state(model, cfg, batch, jax.random.key(0),
                             steps_per_epoch=steps_per_epoch)
    step_fn = make_gan_train_step(model, extrap=True, lr_schedule=sched)

    lrs = []
    for i in range(4):
        state, metrics = step_fn(state, batch, jax.random.key(i))
        lrs.append(float(metrics["lr"]))
    np.testing.assert_allclose(lrs[0], 1e-3, rtol=1e-6)
    np.testing.assert_allclose(lrs[2], 1e-3 * 0.99, rtol=1e-6)
    # schedule is inside the optimizer too: opt state count advanced and
    # params changed each step
    assert int(state.step) == 4
    for v in jax.tree_util.tree_leaves(state.gen_params):
        assert np.isfinite(np.asarray(v)).all()


@pytest.mark.slow
def test_train_gan_loop_periodic_eval(tmp_path):
    """train_gan end-to-end: eval hook fires every gan_test_freq_epochs,
    dumps an image sheet, and reports test metrics."""
    from ode_rl_tpu.train.loop import train_gan

    cfg = Config({
        "model": "VidODE", "dataset": "mmnist", "phase": "train",
        "gan": True, "id": "vidode_gan_smoke", "ckpt_id": "vidode_gan_smoke",
        "lr": 1e-3, "lr_decay": 0.99, "clip": -1,
        "epochs": 2, "steps_per_epoch": 2, "batch_size": 2,
        "train_seq": 5, "train_in_seq": 3, "train_out_seq": 2,
        "test_seq": 5, "test_in_seq": 3, "test_out_seq": 2,
        "num_digits": 1, "in_channels": 1,
        "n_downs": 2, "n_layers": 1, "n_ode_layers": 1, "ode_max_steps": 16,
        "decode_diff_method": "euler",
        "gan_test_freq_epochs": 1, "loss_log_freq": 1,
        "ckpt_save_freq": 1000, "quiet": True, "logdir": str(tmp_path),
        "total_frames": 100, "train_test_split": 0.8,
    })
    result = train_gan(cfg, logdir=None)
    assert result["final_step"] == 4
    assert "test_mse" in result
    run_dir = tmp_path / "VidODE" / "vidode_gan_smoke_3_2"
    dumps = list(run_dir.glob("test_epoch*.png"))
    assert len(dumps) == 2, f"expected 2 eval image dumps, got {dumps}"
    # decayed LR visible in the logged metrics
    assert np.isclose(result["lr"], 1e-3 * 0.99, rtol=1e-5)


@pytest.mark.slow
def test_gan_step_interp_mode_runs():
    """Interpolation-mode GAN (extrapolate=False): the seq discriminator
    sees identity-masked single-frame swaps of the real context
    (reference gan.py:138-159) — regression for the extrap flag being
    hard-wired True. Requires equal context/target lengths."""
    n_in = n_out = 3
    loader = iter(MovingMNIST(batch_size=2, n_frames_input=n_in,
                              n_frames_output=n_out))
    batch = make_batch_dict(next(loader), n_in=n_in)
    model = VidODEModel(in_channels=1, n_downs=1, base_ch=8, n_layers=1,
                        ode_max_steps=16)
    cfg = Config({"lr": 1e-3, "lr_decay": 0.99})
    state = create_gan_state(model, cfg, batch, jax.random.key(0),
                             steps_per_epoch=2, extrap=False)
    # interp windows keep t frames (no +1): seq-D input is t*c channels
    seq_kernel = jax.tree_util.tree_leaves(
        state.disc_params["seq"])[0]
    step_fn = make_gan_train_step(model, extrap=False)
    state, metrics = step_fn(state, batch, jax.random.key(1))
    for k in ("d_loss", "g_loss"):
        assert np.isfinite(float(metrics[k])), k


@pytest.mark.slow
def test_gan_state_extrap_seq_disc_width():
    """Extrapolation-mode seq discriminator is built for (t_ctx+1)·c
    input channels (reference gan.py:162-177 create_netD sizing)."""
    n_in, n_out = 3, 2
    loader = iter(MovingMNIST(batch_size=2, n_frames_input=n_in,
                              n_frames_output=n_out))
    batch = make_batch_dict(next(loader), n_in=n_in)
    model = VidODEModel(in_channels=1, n_downs=1, base_ch=8, n_layers=1,
                        ode_max_steps=16)
    cfg = Config({"lr": 1e-3})
    state = create_gan_state(model, cfg, batch, jax.random.key(0),
                             extrap=True)
    l1_kernel = state.disc_params["seq"]["l1"]["kernel"]
    assert l1_kernel.shape[2] == (n_in + 1) * 1   # (t_ctx+1)·c input width
