"""Tests for the S3VAE / S2VAE / DS2VAE / VidODE model families."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ode_rl_tpu.core.config import Config
from ode_rl_tpu.data import MovingMNIST, make_batch_dict
from ode_rl_tpu.models.ds2vae import DS2VAEModel
from ode_rl_tpu.models.s2vae import S2VAEModel
from ode_rl_tpu.models.s3vae import S3VAEModel
from ode_rl_tpu.models.vidode import VidODEModel
from ode_rl_tpu.train.step import (
    create_train_state, make_eval_step, make_train_step)

CFG = Config({"lr": 1e-3, "clip": -1})


def batch_for(n_in, n_out, b=2, flow=False):
    loader = iter(MovingMNIST(batch_size=b, n_frames_input=n_in,
                              n_frames_output=n_out))
    return make_batch_dict(next(loader), n_in=n_in, with_flow_labels=flow)


def run_steps(model, batch, n=3):
    state = create_train_state(model, CFG, batch, jax.random.key(0))
    step = make_train_step(model, donate=False)
    losses = []
    for i in range(n):
        state, m = step(state, batch, jax.random.key(i))
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all(), losses
    return state, m, losses


# ------------------------------- S3VAE ------------------------------------

S3_VARIANTS = [
    ("default", dict()),
    ("slot", dict(slot_att=True, num_slots=2, slot_size=32)),
    ("rim", dict(rim=True, n_hid=300, unit_per_rim=100)),
    ("cgru", dict(encoder="cgru", d_zf=16, d_zt=8)),
    ("odecgru", dict(encoder="odecgru", d_zf=16, d_zt=8)),
    ("cgru_rim", dict(encoder="cgru_rim", d_zf=16, d_zt=8,
                      rim_num_blocks=4, rim_topk=2)),
]


@pytest.mark.parametrize("name,kw", S3_VARIANTS, ids=[v[0] for v in S3_VARIANTS])
@pytest.mark.slow
def test_s3vae_variants_train(name, kw):
    batch = batch_for(5, 5, flow=True)
    model = S3VAEModel(in_channels=1, d_zf=kw.pop("d_zf", 32),
                       d_zt=kw.pop("d_zt", 8), n_hid=kw.pop("n_hid", 64),
                       encoder_out_dims=32, **kw)
    _, m, losses = run_steps(model, batch)
    for key in ("vae_loss", "scc_loss", "dfp_loss", "mi_loss", "recon_loss"):
        assert key in m


@pytest.mark.slow
def test_s3vae_all_losses_contribute():
    """Each loss-term weight must change the total (no dead terms)."""
    batch = batch_for(5, 5, flow=True)
    base = dict(in_channels=1, d_zf=32, d_zt=8, n_hid=64,
                encoder_out_dims=32)
    m0 = run_steps(S3VAEModel(**base), batch, n=1)[1]
    total = float(m0["loss"])
    reconstructed = (10.0 * float(m0["vae_loss"])
                     + 1000.0 * float(m0["scc_loss"])
                     + 100.0 * float(m0["dfp_loss"])
                     + 1.0 * float(m0["mi_loss"]))
    assert abs(total - reconstructed) / abs(total) < 1e-4


@pytest.mark.slow
def test_s3vae_eval_reconstructs_full_sequence():
    batch = batch_for(5, 3)
    model = S3VAEModel(in_channels=1, d_zf=32, d_zt=8, n_hid=64,
                       encoder_out_dims=32)
    state = create_train_state(
        model, CFG, batch_for(5, 3, flow=True), jax.random.key(0))
    ev = make_eval_step(model)
    metrics, pred = ev(state.variables, batch, jax.random.key(1))
    # test-phase out_seq = in + out (reference S3VAE.py:26-28)
    assert pred.shape[1] == 8
    assert metrics["mse"].shape == (8,)


@pytest.mark.slow
def test_s3vae_batchnorm_stats_update():
    batch = batch_for(5, 5, flow=True)
    model = S3VAEModel(in_channels=1, d_zf=32, d_zt=8, n_hid=64,
                       encoder_out_dims=32)
    state = create_train_state(model, CFG, batch, jax.random.key(0))
    assert "batch_stats" in state.model_state
    step = make_train_step(model, donate=False)
    new_state, _ = step(state, batch, jax.random.key(1))
    before = jax.tree_util.tree_leaves(state.model_state)[0]
    after = jax.tree_util.tree_leaves(new_state.model_state)[0]
    assert float(jnp.abs(before - after).max()) > 0  # running stats moved


def test_s3vae_scc_negative_reuse_is_exact():
    """The SCC negative's encoder pass is the identity on a batch
    permutation of the anchor features: the FrameEncoder is frame-wise
    and its BatchNorm statistics are over the flattened (b·t) frames —
    invariant under a batch permutation. Pins the reuse optimization in
    models/s3vae.py (one encoder pass instead of two per step)."""
    from ode_rl_tpu.nn.s3vae_nets import FrameEncoder

    b, t = 4, 3
    frames = jax.random.normal(jax.random.key(0), (b, t, 64, 64, 1))
    perm_b = jax.random.permutation(jax.random.key(1), b)
    enc = FrameEncoder(encoder_type="default", out_dims=16)
    flat = frames.reshape(b * t, 64, 64, 1)
    variables = enc.init(jax.random.key(2), flat)

    def encode(x):
        out, _ = enc.apply(variables, x.reshape(b * t, 64, 64, 1),
                           train=True, mutable=["batch_stats"])
        return out.reshape(b, t, -1)

    feats = encode(frames)
    re_encoded = encode(frames[perm_b])
    np.testing.assert_allclose(np.asarray(re_encoded),
                               np.asarray(feats[perm_b]),
                               rtol=2e-5, atol=2e-5)


def test_s3vae_static_batch_fusion_is_exact():
    """The anchor/positive/negative static passes share parameters and
    are independent, so models/s3vae.py runs them as ONE pass with the
    three inputs stacked on the batch axis (one GRU scan instead of
    three sequential T-step scans). Pins the identity the fusion relies
    on: every op in the static path is row-wise in the batch."""
    from ode_rl_tpu.nn.s3vae_nets import GRUEncoder

    enc = GRUEncoder(hidden=32, z_size=16, head_type="static")
    xs = jax.random.normal(jax.random.key(0), (4, 6, 24))
    ys = jax.random.normal(jax.random.key(1), (4, 6, 24))
    zs = jax.random.normal(jax.random.key(2), (4, 6, 24))
    variables = enc.init(jax.random.key(3), xs)
    sep = [enc.apply(variables, v) for v in (xs, ys, zs)]
    mu3, lv3 = enc.apply(variables, jnp.concatenate([xs, ys, zs], axis=0))
    for (mu_s, lv_s), mu_b, lv_b in zip(
            sep, jnp.split(mu3, 3, axis=0), jnp.split(lv3, 3, axis=0)):
        np.testing.assert_allclose(np.asarray(mu_b), np.asarray(mu_s),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(lv_b), np.asarray(lv_s),
                                   rtol=1e-5, atol=1e-6)


# ------------------------------- S2VAE ------------------------------------

@pytest.mark.slow
def test_s2vae_gru_trains():
    batch = batch_for(13, 4)
    model = S2VAEModel(in_channels=1, d_zf=32, num_slots=2, slot_size=32,
                       gru_layers=2)
    _, m, _ = run_steps(model, batch)
    assert "kl_loss" in m


@pytest.mark.slow
def test_s2vae_inferred_prior_changes_kl():
    batch = batch_for(13, 4)
    m_std = run_steps(S2VAEModel(in_channels=1, d_zf=32, num_slots=2,
                                 slot_size=32), batch, n=1)[1]
    m_inf = run_steps(S2VAEModel(in_channels=1, d_zf=32, num_slots=2,
                                 slot_size=32, prior="infer"), batch, n=1)[1]
    assert float(m_std["kl_loss"]) != float(m_inf["kl_loss"])


@pytest.mark.slow
def test_s2vae_masked_decoding():
    batch = batch_for(13, 4)
    model = S2VAEModel(in_channels=1, d_zf=32, num_slots=2, slot_size=32,
                       unmasked=False)
    state, m, _ = run_steps(model, batch, n=2)
    ev = make_eval_step(model)
    _, pred = ev(state.variables, batch, jax.random.key(0))
    assert pred.shape == (2, 4, 64, 64, 1)
    assert 0.0 <= float(pred.min()) and float(pred.max()) <= 1.0


@pytest.mark.slow
def test_cs2vae_conv_transition():
    batch = batch_for(13, 4)
    model = S2VAEModel(in_channels=1, d_zf=32, num_slots=2, slot_size=32,
                       transition="cgru", conv_mode=True)
    run_steps(model, batch, n=2)


# ------------------------------- DS2VAE -----------------------------------

@pytest.mark.slow
def test_ds2vae_complete_model_trains():
    """The reference leaves DS2VAE unfinished (get_loss is `pass`); ours
    must produce finite losses with all three terms."""
    batch = batch_for(13, 4)
    model = DS2VAEModel(in_channels=1, d_zf=32, n_hid=64, num_slots=2,
                        slot_size=32, num_blocks=2, topk=1)
    _, m, losses = run_steps(model, batch)
    for key in ("recon_loss", "kl_zf", "kl_zt"):
        assert key in m and np.isfinite(float(m[key]))


# ------------------------------- VidODE -----------------------------------

@pytest.mark.slow
def test_vidode_trains_and_loss_decreases():
    batch = batch_for(5, 4)
    model = VidODEModel(in_channels=1, n_downs=2, base_ch=8, n_layers=1,
                        ode_max_steps=48)
    _, m, losses = run_steps(model, batch, n=6)
    assert losses[-1] < losses[0]
    assert "recon_l1" in m and "diff_l1" in m and "nfe" in m


@pytest.mark.slow
def test_vidode_composition_structure():
    """Flow/intermediate/mask decomposition must reconstruct the pred."""
    batch = batch_for(5, 3)
    model = VidODEModel(in_channels=1, n_downs=2, base_ch=8, n_layers=1,
                        ode_max_steps=48)
    variables = model.init(
        {"params": jax.random.key(0), "sample": jax.random.key(1)},
        batch, train=False, method=model.predict)
    pred, aux = model.apply(variables, batch, train=False,
                            method=model.predict)
    assert aux["_flows"].shape == (2, 3, 64, 64, 2)
    assert aux["_masks"].shape == (2, 3, 64, 64, 1)
    m = np.asarray(aux["_masks"])
    assert (m >= 0).all() and (m <= 1).all()
