import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ode_rl_tpu.core.config import Config
from ode_rl_tpu.data import MovingMNIST, make_batch_dict
from ode_rl_tpu.models.convgru import ConvGRUModel
from ode_rl_tpu.models.odeconvgru import ODEConvGRUModel
from ode_rl_tpu.train.step import (
    create_train_state, make_eval_step, make_train_step)

CFG = Config({"lr": 1e-3, "clip": -1})


def tiny_batch(n_in=4, n_out=3, b=2):
    loader = iter(MovingMNIST(batch_size=b, n_frames_input=n_in,
                              n_frames_output=n_out))
    return make_batch_dict(next(loader), n_in=n_in)


def small_convgru():
    return ConvGRUModel(in_channels=1, conv_encoder_out_ch=32,
                        convgru_out_ch=32)


def small_odeconvgru(**kw):
    return ODEConvGRUModel(in_channels=1, conv_encoder_out_ch=32,
                           neural_ode_decoder_out_ch=32,
                           neural_ode_n_units=32, n_ode_layers=1,
                           ode_max_steps=64, **kw)


@pytest.mark.parametrize("model_fn", [small_convgru, small_odeconvgru])
def test_predict_shape_and_range(model_fn):
    model = model_fn()
    batch = tiny_batch()
    params = model.init(jax.random.key(0), batch, train=False,
                        method=model.predict)
    pred, aux = model.apply(params, batch, train=False, method=model.predict)
    assert pred.shape == (2, 3, 64, 64, 1)
    assert float(pred.min()) >= 0.0 and float(pred.max()) <= 1.0


@pytest.mark.parametrize("model_fn", [small_convgru, small_odeconvgru])
@pytest.mark.slow
def test_loss_decreases(model_fn):
    model = model_fn()
    batch = tiny_batch()
    state = create_train_state(model, CFG, batch, jax.random.key(0))
    step = make_train_step(model, donate=False)
    losses = []
    rng = jax.random.key(1)
    for i in range(8):
        rng, sub = jax.random.split(rng)
        state, metrics = step(state, batch, sub)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0]
    assert np.isfinite(losses).all()


def test_odeconvgru_reports_nfe():
    model = small_odeconvgru()
    batch = tiny_batch()
    params = model.init(jax.random.key(0), batch, train=False,
                        method=model.predict)
    _, aux = model.apply(params, batch, train=False, method=model.predict)
    assert int(aux["nfe"]) >= 7
    assert int(aux["ode_converged"]) == 1


def test_odeconvgru_mem_mode():
    model = small_odeconvgru(mem=True)
    batch = tiny_batch()
    params = model.init(jax.random.key(0), batch, train=False,
                        method=model.predict)
    pred, _ = model.apply(params, batch, train=False, method=model.predict)
    assert pred.shape == (2, 3, 64, 64, 1)
    assert np.isfinite(np.asarray(pred)).all()


@pytest.mark.parametrize("method", ["euler", "rk4", "midpoint"])
def test_odeconvgru_fixed_step_methods(method):
    model = small_odeconvgru(method=method)
    batch = tiny_batch()
    params = model.init(jax.random.key(0), batch, train=False,
                        method=model.predict)
    pred, _ = model.apply(params, batch, train=False, method=model.predict)
    assert np.isfinite(np.asarray(pred)).all()


def test_eval_step_per_horizon():
    model = small_convgru()
    batch = tiny_batch()
    state = create_train_state(model, CFG, batch, jax.random.key(0))
    ev = make_eval_step(model)
    metrics, pred = ev(state.variables, batch)
    assert metrics["mse"].shape == (3,)
    assert pred.shape == (2, 3, 64, 64, 1)


def test_long_horizon_eval():
    """The reference's stress case: few observed, many predicted frames."""
    model = small_convgru()
    batch = tiny_batch(n_in=4, n_out=20)
    params = model.init(jax.random.key(0), batch, train=False,
                        method=model.predict)
    pred, _ = model.apply(params, batch, train=False, method=model.predict)
    assert pred.shape == (2, 20, 64, 64, 1)


@pytest.mark.slow
def test_cgrudecode_ode_decoder_path():
    """cgrudecODE: ConvGRU encoder + Neural-ODE decode (the capability the
    reference's main.py:57-58 flag promises; its DecODEr draft never ran)."""
    model = ConvGRUModel(in_channels=1, conv_encoder_out_ch=16,
                         convgru_out_ch=16, decODE=True, latent_dim=16,
                         n_ode_layers=1, neural_ode_n_units=16,
                         ode_max_steps=32)
    batch = tiny_batch()
    params = model.init(jax.random.key(0), batch, train=False,
                        method=model.predict)
    pred, aux = model.apply(params, batch, train=False, method=model.predict)
    assert pred.shape == batch["data_to_predict"].shape
    assert "nfe" in aux and int(aux["nfe"]) > 0
    # trains: loss decreases over a few steps
    from ode_rl_tpu.train.step import create_train_state, make_train_step
    state = create_train_state(model, CFG, batch, jax.random.key(0))
    step = make_train_step(model, donate=False)
    _, m0 = step(state, batch, jax.random.key(1))
    for i in range(5):
        state, m = step(state, batch, jax.random.key(i))
    assert float(m["loss"]) < float(m0["loss"])


def test_odeconvgru_z_sample():
    """sample_odecgru: z0 ~ N(mu, std) — stochastic given different rng,
    deterministic given the same key."""
    model = small_odeconvgru(z_sample=True)
    batch = tiny_batch()
    params = model.init({"params": jax.random.key(0),
                         "sample": jax.random.key(1)},
                        batch, train=False, method=model.predict)
    p1, _ = model.apply(params, batch, train=False, method=model.predict,
                        rngs={"sample": jax.random.key(2)})
    p2, _ = model.apply(params, batch, train=False, method=model.predict,
                        rngs={"sample": jax.random.key(3)})
    p3, _ = model.apply(params, batch, train=False, method=model.predict,
                        rngs={"sample": jax.random.key(2)})
    assert not np.allclose(p1, p2), "z_sample must actually sample"
    np.testing.assert_allclose(p1, p3, rtol=1e-6)


def test_odeconvgru_z_sample_kl_regularizer():
    """Regression pin for the z_sample degenerate attractor (round-3
    finding): without a KL term, plain-MSE training blows |mu|,|std| up
    until the sigmoid saturates all-black, gradients hit exactly zero,
    and Adam momentum coasts the latent head into NaN. The latent-ODE
    ELBO term (z_kl_weight > 0) must (a) surface a finite z0_kl metric,
    (b) enter the loss, and (c) penalize large mu/std so the attractor
    has positive loss gradient."""
    model = small_odeconvgru(z_sample=True, z_kl_weight=0.01)
    batch = tiny_batch()
    variables = model.init({"params": jax.random.key(0),
                            "sample": jax.random.key(1)},
                           batch, train=True, method=model.loss)
    loss, (metrics, _) = model.apply(
        variables, batch, train=True, method=model.loss,
        rngs={"sample": jax.random.key(2)})
    assert "z0_kl" in metrics and np.isfinite(float(metrics["z0_kl"]))
    np.testing.assert_allclose(
        float(loss),
        float(metrics["mse"]) + 0.01 * float(metrics["z0_kl"]), rtol=1e-5)

    # The KL gradient must pull an inflated latent head back down: scale
    # the z0 head weights up and the KL term must grow superlinearly.
    import flax
    flat = flax.traverse_util.flatten_dict(variables["params"])
    inflated = {
        k: (v * 8.0 if "z0_encoder" in "/".join(k) else v)
        for k, v in flat.items()}
    inflated = {"params": flax.traverse_util.unflatten_dict(inflated)}
    _, (m_inf, _) = model.apply(
        inflated, batch, train=True, method=model.loss,
        rngs={"sample": jax.random.key(2)})
    assert float(m_inf["z0_kl"]) > 4.0 * float(metrics["z0_kl"])


@pytest.mark.slow
def test_mem_variant_shipped_config_health():
    """Regression pin for the mem-variant stiff-regime failure mode
    (round-2 HANDOFF #3): at the SHIPPED train_mmnist_odecgrumem
    config (architecture dims, tolerances, mem=True), a few train steps
    must keep the solver clearly below its step budget (NFE < 0.8 × the
    6·max_steps ceiling) with finite loss and gradients. If the config
    ever drifts back into the NFE≈budget regime, this fails."""
    import pathlib

    from ode_rl_tpu.core.config import load_config
    from ode_rl_tpu.models import build_model

    cfg_path = pathlib.Path(__file__).parent.parent / "configs.yaml"
    cfg = load_config(["defaults", "train_mmnist_odecgrumem_len20_1ch"],
                      config_path=cfg_path)
    assert cfg.mem is True
    model = build_model(cfg)

    batch = tiny_batch(n_in=4, n_out=4, b=2)
    state = create_train_state(model, cfg, batch, jax.random.key(0))
    step = make_train_step(model, donate=False)
    rng = jax.random.key(1)
    budget_nfe = 6 * int(cfg.ode_max_steps)
    for _ in range(3):
        rng, sub = jax.random.split(rng)
        state, metrics = step(state, batch, sub)
        m = {k: float(v) for k, v in jax.device_get(metrics).items()}
        assert np.isfinite(m["loss"]), m
        assert np.isfinite(m["grad_norm"]) and m["grad_norm"] > 0, m
        assert m["nfe"] < 0.8 * budget_nfe, (
            f"mem variant near its NFE budget: {m['nfe']} vs {budget_nfe}")


@pytest.mark.slow
def test_z_sample_shipped_config_wires_kl_and_nan_guard():
    """Regression pin for the z_sample divergence fix (round-3): the
    SHIPPED train_mmnist_sample_odecgru block must reach the model with
    a positive z_kl_weight (the latent-ODE ELBO term that removes the
    all-black attractor) and keep nan_guard on. A few train steps at the
    shipped wiring must surface a finite, positive z0_kl metric and a
    live gradient."""
    import pathlib

    from ode_rl_tpu.core.config import load_config
    from ode_rl_tpu.models import build_model

    cfg_path = pathlib.Path(__file__).parent.parent / "configs.yaml"
    cfg = load_config(["defaults", "train_mmnist_sample_odecgru"],
                      config_path=cfg_path)
    assert cfg.z_sample is True
    assert float(cfg.z_kl_weight) > 0.0
    assert cfg.nan_guard is True
    model = build_model(cfg)
    assert model.z_kl_weight == float(cfg.z_kl_weight)

    batch = tiny_batch(n_in=4, n_out=4, b=2)
    state = create_train_state(model, cfg, batch, jax.random.key(0))
    step = make_train_step(model, nan_guard=True, donate=False)
    rng = jax.random.key(1)
    for _ in range(2):
        rng, sub = jax.random.split(rng)
        state, metrics = step(state, batch, sub)
        m = {k: float(v) for k, v in jax.device_get(metrics).items()}
        assert np.isfinite(m["loss"]), m
        assert np.isfinite(m["grad_norm"]) and m["grad_norm"] > 0, m
        assert m["z0_kl"] > 0 and np.isfinite(m["z0_kl"]), m
        assert m["nan_skipped"] == 0, m


def test_odeconvgru_nru2_mode():
    """Two-pass memory mode (reference Vid-ODE/models/ode_func.py:48-66
    nru2; stable form in ode/memory.py): finite output, and the global
    pass's NFE shows up on top of the stepwise pass's."""
    m_nru = small_odeconvgru(mem=True, mem_mode="nru")
    m_nru2 = small_odeconvgru(mem=True, mem_mode="nru2")
    batch = tiny_batch()
    params = m_nru.init(jax.random.key(0), batch, train=False,
                        method=m_nru.predict)
    pred1, aux1 = m_nru.apply(params, batch, train=False,
                              method=m_nru.predict)
    pred2, aux2 = m_nru2.apply(params, batch, train=False,
                               method=m_nru2.predict)
    assert pred2.shape == pred1.shape
    assert np.isfinite(np.asarray(pred2)).all()
    # nru2 = nru + one extra global solve → strictly more field evals.
    assert int(aux2["nfe"]) > int(aux1["nfe"])
    # The refined initial state changes the trajectory (unless the mean
    # displacement is exactly zero, which a random init never is).
    assert not np.allclose(np.asarray(pred1), np.asarray(pred2))


def test_odeint_memory_linear_ode_accuracy():
    """On dy/dt = -y the stepwise pass must track exp(-t); nru2's
    refinement starts from a shifted state but still integrates the same
    field, staying bounded."""
    from ode_rl_tpu.ode.memory import odeint_memory

    f = lambda t, y: -y
    y0 = jnp.ones((4,))
    tp = jnp.linspace(0.25, 2.0, 8)
    ys, stats = odeint_memory(f, y0, jnp.asarray(0.0), tp, method="dopri5",
                              rtol=1e-5, atol=1e-7, max_steps=256,
                              mode="nru")
    np.testing.assert_allclose(np.asarray(ys[:, 0]), np.exp(-np.asarray(tp)),
                               rtol=1e-4)
    ys2, stats2 = odeint_memory(f, y0, jnp.asarray(0.0), tp,
                                method="dopri5", rtol=1e-5, atol=1e-7,
                                max_steps=256, mode="nru2")
    assert np.isfinite(np.asarray(ys2)).all()
    assert int(stats2["nfe"]) > int(stats["nfe"])
    import pytest as _pytest
    with _pytest.raises(NotImplementedError):
        odeint_memory(f, y0, jnp.asarray(0.0), tp, mode="bogus")


def test_vidode_mem_modes_forward():
    """mem/nru2 are on the VidODE config surface too (VERDICT r4 #8)."""
    from ode_rl_tpu.data.protocol import make_batch_dict
    from ode_rl_tpu.models.vidode import VidODEModel

    rng = np.random.RandomState(0)
    video = jnp.asarray(rng.rand(2, 6, 32, 32, 1).astype(np.float32) - 0.5)
    batch = make_batch_dict(video, n_in=3)
    for mode in ("nru", "nru2"):
        model = VidODEModel(in_channels=1, n_downs=2, base_ch=8,
                            n_layers=2, method="euler", ode_max_steps=16,
                            mem=True, mem_mode=mode)
        variables = model.init({"params": jax.random.key(0)}, batch,
                               train=False, method=model.predict)
        pred, aux = model.apply(variables, batch, train=False,
                                method=model.predict)
        assert pred.shape == (2, 3, 32, 32, 1)
        assert np.isfinite(np.asarray(pred)).all()
