"""Tests for the Dreamer world-model stack (wm/)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ode_rl_tpu.core.config import Config
from ode_rl_tpu.data import MovingMNIST, make_batch_dict
from ode_rl_tpu.nn.impala import ImpalaCNN
from ode_rl_tpu.wm import RSSM, WorldModel, lambda_return, schedule
from ode_rl_tpu.wm.classifier import (
    FeatureClassifier, mean_average_precision, top_k_accuracy)
from ode_rl_tpu.wm.spatial_rssm import SpatialRSSM
from ode_rl_tpu.wm.world_model import DreamerVideoModel


def _embed(b=2, t=5, e=16):
    return jax.random.normal(jax.random.key(0), (b, t, e))


@pytest.mark.parametrize("discrete", [0, 8])
@pytest.mark.slow
def test_rssm_observe_shapes(discrete):
    rssm = RSSM(stoch=6, deter=16, hidden=16, discrete=discrete)
    embed = _embed()
    v = rssm.init(jax.random.key(1), embed, jax.random.key(2),
                  method=rssm.observe)
    post, prior = rssm.apply(v, embed, jax.random.key(3),
                             method=rssm.observe)
    assert post["deter"].shape == (2, 5, 16)
    if discrete:
        assert post["logit"].shape == (2, 5, 6, 8)
        # straight-through samples are one-hot in value
        s = np.asarray(post["stoch"])
        np.testing.assert_allclose(s.sum(-1), 1.0, atol=1e-5)
    else:
        assert post["mean"].shape == (2, 5, 6)
        assert (np.asarray(post["std"]) > 0).all()


@pytest.mark.parametrize("discrete", [0, 8])
def test_rssm_observe_scan_matches_stepwise(discrete):
    """The observe scan's fast body (hoisted embed projection, merged
    imo0/obi0-deter contraction, pre-drawn sampling noise) computes the
    same chain as the public per-step obs_step: same subkeys, same
    primitives. Tolerance is 1-ulp-level only because XLA may contract
    ``mean + std*noise`` into an FMA in one program and not the other;
    stats/deter at step 0 are bit-equal (verified during development)."""
    rssm = RSSM(stoch=6, deter=16, hidden=16, discrete=discrete)
    embed = _embed()
    key = jax.random.key(3)
    v = rssm.init(jax.random.key(1), embed, jax.random.key(2),
                  method=rssm.observe)
    post, prior = rssm.apply(v, embed, key, method=rssm.observe)

    state = rssm.apply(v, embed.shape[0], method=rssm.initial)
    keys = jax.random.split(key, embed.shape[1])
    for t in range(embed.shape[1]):
        p_t, pr_t = rssm.apply(v, state, embed[:, t], keys[t],
                               method=rssm.obs_step)
        for k in p_t:
            np.testing.assert_allclose(
                np.asarray(p_t[k]), np.asarray(post[k][:, t]),
                atol=1e-5, rtol=1e-5, err_msg=k)
            np.testing.assert_allclose(
                np.asarray(pr_t[k]), np.asarray(prior[k][:, t]),
                atol=1e-5, rtol=1e-5, err_msg=k)
        state = p_t


def test_rssm_imagine_scan_matches_stepwise():
    """imagine()'s pre-drawn-noise scan equals per-step img_step."""
    rssm = RSSM(stoch=6, deter=16, hidden=16, discrete=8)
    embed = _embed()
    v = rssm.init(jax.random.key(1), embed, jax.random.key(2),
                  method=rssm.observe)
    post, _ = rssm.apply(v, embed, jax.random.key(3), method=rssm.observe)
    start = {k: v_[:, -1] for k, v_ in post.items()}
    key = jax.random.key(9)
    prior = rssm.apply(v, 4, start, key, method=rssm.imagine)
    state, keys = start, jax.random.split(key, 4)
    for t in range(4):
        state = rssm.apply(v, state, keys[t], method=rssm.img_step)
        for k in state:
            np.testing.assert_allclose(
                np.asarray(state[k]), np.asarray(prior[k][:, t]),
                atol=1e-5, rtol=1e-5, err_msg=k)


@pytest.mark.slow
def test_rssm_imagine_open_loop():
    rssm = RSSM(stoch=6, deter=16, hidden=16)
    embed = _embed()
    v = rssm.init(jax.random.key(1), embed, jax.random.key(2),
                  method=rssm.observe)
    post, _ = rssm.apply(v, embed, jax.random.key(3), method=rssm.observe)
    init = jax.tree_util.tree_map(lambda x: x[:, -1], post)
    prior = rssm.apply(v, 7, init, jax.random.key(4), method=rssm.imagine)
    assert prior["deter"].shape == (2, 7, 16)


def test_rssm_kl_balanced_and_free_bits():
    rssm = RSSM(stoch=6, deter=16, hidden=16)
    embed = _embed()
    v = rssm.init(jax.random.key(1), embed, jax.random.key(2),
                  method=rssm.observe)
    post, prior = rssm.apply(v, embed, jax.random.key(3),
                             method=rssm.observe)
    loss, value = rssm.apply(v, post, prior, method=rssm.kl_loss)
    assert np.isfinite(float(loss))
    # free bits floor: with huge free, the loss equals free
    loss_free, _ = rssm.apply(v, post, prior, False, 0.8, 1e6, 1.0,
                              method=rssm.kl_loss)
    assert abs(float(loss_free) - 1e6) < 1.0
    # identical dists → KL value ~0
    loss0, value0 = rssm.apply(v, post, post, method=rssm.kl_loss)
    np.testing.assert_allclose(np.asarray(value0), 0.0, atol=1e-4)


@pytest.mark.slow
def test_world_model_trains():
    loader = iter(MovingMNIST(batch_size=2, n_frames_input=6,
                              n_frames_output=0))
    batch = {"image": next(loader)}
    wm = WorldModel(stoch=8, deter=32, hidden=32, cnn_depth=8)
    v = wm.init({"params": jax.random.key(0), "sample": jax.random.key(1)},
                batch, method=wm.loss)
    loss, (m, pred) = wm.apply(v, batch, method=wm.loss,
                               rngs={"sample": jax.random.key(2)})
    assert np.isfinite(float(loss))
    assert pred.shape == batch["image"].shape
    assert "kl_loss" in m and "image_loss" in m


@pytest.mark.slow
def test_dreamer_adapter_standard_api():
    """Dreamer must train through the framework's generic train step."""
    from ode_rl_tpu.train.step import create_train_state, make_train_step
    loader = iter(MovingMNIST(batch_size=2, n_frames_input=4,
                              n_frames_output=3))
    batch = make_batch_dict(next(loader), n_in=4)
    model = DreamerVideoModel(stoch=8, deter=32, hidden=32, cnn_depth=8)
    state = create_train_state(model, Config({"lr": 3e-4, "clip": -1}),
                               batch, jax.random.key(0))
    step = make_train_step(model, donate=False)
    losses = []
    for i in range(3):
        state, m = step(state, batch, jax.random.key(i))
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    pred, _ = model.apply(state.variables, batch, method=model.predict,
                          rngs={"sample": jax.random.key(9)})
    assert pred.shape == (2, 3, 64, 64, 1)


@pytest.mark.slow
def test_spatial_rssm_stochastic_gates():
    m = SpatialRSSM(stoch_ch=4, deter_ch=8, hidden_ch=8, latent_hw=8,
                    stochastic_gates=True)
    embed = jax.random.normal(jax.random.key(0), (2, 4, 8, 8, 8))
    v = m.init(jax.random.key(1), embed, jax.random.key(2),
               method=m.observe)
    post, prior, gate = m.apply(v, embed, jax.random.key(3),
                                method=m.observe)
    assert post["stoch"].shape == (2, 4, 8, 8, 4)
    assert 0.0 < float(gate) < 1.0   # Bernoulli gate activity


def test_impala_cnn():
    enc = ImpalaCNN(out_features=32)
    x = jax.random.normal(jax.random.key(0), (2, 64, 64, 1))
    p = enc.init(jax.random.key(1), x)
    assert enc.apply(p, x).shape == (2, 32)


def test_classifier_metrics():
    labels = jnp.eye(4)
    perfect = labels * 10.0 - 5.0
    assert float(mean_average_precision(perfect, labels)) == 1.0
    assert float(top_k_accuracy(perfect, labels, 1)) == 1.0
    inverted = -perfect
    assert float(top_k_accuracy(inverted, labels, 1)) == 0.0


def test_schedules_and_lambda_return():
    assert float(schedule("linear(1,0,10)", 5)) == 0.5
    assert float(schedule(0.3, 100)) == pytest.approx(0.3)
    # λ=1 reduces to discounted Monte-Carlo return
    reward = jnp.ones((5, 1))
    value = jnp.zeros((5, 1))
    pcont = jnp.full((5, 1), 0.9)
    ret = lambda_return(reward, value, pcont, jnp.zeros((1,)), 1.0)
    expected = sum(0.9**i for i in range(5))
    assert abs(float(ret[0, 0]) - expected) < 1e-4


def test_cem_planner_finds_target():
    """CEM must find action sequences maximizing a known objective:
    reward = -||a - target||² → plan converges to the target actions."""
    from ode_rl_tpu.wm.planners import cem_planner, grad_planner

    target = jnp.array([[0.7, -0.3]] * 4)  # (H=4, A=2)

    def rollout_fn(candidates, key):
        return -jnp.sum((candidates - target[None]) ** 2, axis=(1, 2))

    plan = cem_planner(rollout_fn, jax.random.key(0), horizon=4,
                       action_dim=2, iterations=8, proposals=500, topk=50)
    np.testing.assert_allclose(np.asarray(plan), np.asarray(target),
                               atol=0.05)

    plan_g = grad_planner(rollout_fn, jax.random.key(1), horizon=4,
                          action_dim=2, iterations=100, lr=0.2)
    np.testing.assert_allclose(np.asarray(plan_g), np.asarray(target),
                               atol=0.05)


@pytest.mark.slow
def test_classifier_trains_on_worldmodel_features():
    """End-to-end CATER-style pipeline on synthetic labels: world-model
    posterior features → FeatureClassifier, trained until mAP beats
    chance (the reference trains this on CATER data, absent from this
    image — the signal here is a learnable function of the video)."""
    import optax
    from ode_rl_tpu.wm.world_model import WorldModel
    from ode_rl_tpu.wm.classifier import FeatureClassifier

    B, T, n_classes = 8, 4, 3
    key = jax.random.key(0)
    video = jax.random.uniform(key, (B, T, 64, 64, 1)) - 0.5
    # learnable multilabels: per-quadrant mean intensity above the batch
    # median (a real function of the observed pixels)
    q = jnp.stack([video[:, :, :32, :32], video[:, :, :32, 32:],
                   video[:, :, 32:, :32]], axis=-1).mean((1, 2, 3, 4))
    labels = (q > jnp.median(q, axis=0)).astype(jnp.float32)  # (B, 3)

    wm = WorldModel(image_shape=(64, 64, 1), cnn_depth=8, stoch=8,
                    deter=16, hidden=16)
    wv = wm.init({"params": jax.random.key(1), "sample": jax.random.key(2)},
                 {"image": video}, method=wm.loss)

    @jax.jit
    def features(video):
        def feat(m, batch):
            embed = m.encoder(batch["image"])
            post, _ = m.dynamics.observe(embed, jax.random.key(3))
            return m.dynamics.get_feat(post)
        return wm.apply(wv, {"image": video}, method=feat,
                        rngs={"sample": jax.random.key(4)})

    feats = features(video)                      # (B, T, F)
    clf = FeatureClassifier(n_classes=n_classes)
    cv = clf.init(jax.random.key(5), feats)
    opt = optax.adam(1e-2)
    opt_state = opt.init(cv)

    @jax.jit
    def step(cv, opt_state):
        (loss, metrics), g = jax.value_and_grad(
            lambda v: clf.apply(v, feats, labels, method=clf.loss),
            has_aux=True)(cv)
        upd, opt_state = opt.update(g, opt_state, cv)
        return optax.apply_updates(cv, upd), opt_state, loss, metrics

    _, _, loss0, m0 = step(cv, opt_state)
    for _ in range(60):
        cv, opt_state, loss, metrics = step(cv, opt_state)
    assert float(loss) < float(loss0) * 0.5     # actually learns
    assert float(metrics["mAP"]) > 0.9          # near-perfect on train
    assert 0.0 <= float(metrics["top5"]) <= 1.0


def test_cater_layout_corpus_and_loader(tmp_path):
    """CATER-protocol data path (reference dreamerv2/datasets.py:33-46 +
    tools.load_labels:329-333): corpus in the videos/ + lists/<task>/
    layout, multilabel parsing of '<video> <id>,<id>' lines, and episode
    chunking with per-episode targets."""
    from ode_rl_tpu.wm.cater import (CaterEpisodes, load_cater_labels,
                                     write_synthetic_cater)

    root = write_synthetic_cater(tmp_path / "cater", n_train=6, n_val=3,
                                 n_frames=16)
    labels = load_cater_labels(
        root / "lists" / "actions_present" / "train.txt", 10)
    assert len(labels) == 6
    y = next(iter(labels.values()))
    assert y.shape == (10,) and set(np.unique(y)) <= {0.0, 1.0}
    # every episode has ≥1 action and ≥1 color class
    for y in labels.values():
        assert y[:4].sum() >= 1 and y[4:].sum() >= 1

    loader = CaterEpisodes(root, "train", batch_size=2, batch_length=8)
    batch = next(iter(loader))
    assert batch["image"].shape == (2 * 2, 8, 64, 64, 3)   # B·n chunks
    assert batch["label"].shape == (2, 10)
    assert batch["n_chunks"] == 2
    assert float(jnp.abs(batch["image"]).max()) <= 0.5 + 1e-6

    val = CaterEpisodes(root, "val", batch_size=3, batch_length=8)
    assert len(val) == 1


@pytest.mark.slow
def test_train_cater_classifier_end_to_end(tmp_path):
    """The CLI CATER entry end-to-end on a tiny corpus: trains, sweeps the
    val split, writes cater_eval.json, and returns the metric dict
    (regression: the final summary print used stale variable names and
    crashed AFTER the checkpoint was saved — 2026-08-18)."""
    from ode_rl_tpu.core.config import Config
    from ode_rl_tpu.wm.cater import train_cater_classifier

    cfg = Config({
        "id": "cater_test", "ckpt_id": "cater_test", "model":
        "CATERClassifier", "dataset": "cater",
        "data_dir": str(tmp_path / "cater"), "logdir": str(tmp_path / "logs"),
        "batch_size": 2, "batch_length": 4, "n_classes": 10,
        "classifier_lr": 1e-3, "classifier_units": 16, "lr": 3e-4,
        "epochs": 1, "steps_per_epoch": 2, "loss_log_freq": 1,
        "cnn_depth": 4, "dyn_stoch": 4, "dyn_deter": 8, "dyn_hidden": 8,
        "dyn_discrete": 0, "in_channels": 3,
        "cater_train": 4, "cater_val": 2, "cater_frames": 8, "seed": 0})
    final = train_cater_classifier(cfg)
    for k in ("val_mAP", "val_top5", "random_mAP_baseline",
              "val_mAP_reference_metric", "steps"):
        assert k in final
    assert 0.0 <= final["val_mAP"] <= 1.0
    assert (tmp_path / "logs" / "CATER" / "cater_test"
            / "cater_eval.json").exists()


@pytest.mark.slow
def test_spatial_world_model_trains_and_predicts():
    """SpatialWorldModel (ModelBasedRL_TF_V2 training capability): loss
    with sparsity term decreases over a few steps; predict returns
    open-loop frames in [0,1] with the requested horizon."""
    from ode_rl_tpu.core.config import Config
    from ode_rl_tpu.data import MovingMNIST, make_batch_dict
    from ode_rl_tpu.train.step import create_train_state, make_train_step
    from ode_rl_tpu.wm.spatial_rssm import SpatialWorldModel

    loader = iter(MovingMNIST(batch_size=2, n_frames_input=4,
                              n_frames_output=3))
    batch = make_batch_dict(next(loader), n_in=4)
    model = SpatialWorldModel(image_shape=(64, 64, 1), stoch_ch=4,
                              deter_ch=8, hidden_ch=8, embed_ch=8,
                              stochastic_gates=True, sparsity_scale=1e-3)
    cfg = Config({"lr": 3e-4, "clip": 100})
    state = create_train_state(model, cfg, batch, jax.random.key(0))
    step = make_train_step(model, donate=False)
    losses = []
    rng = jax.random.key(1)
    for _ in range(6):
        rng, sub = jax.random.split(rng)
        state, m = step(state, batch, sub)
        losses.append(float(m["loss"]))
        assert np.isfinite(float(m["gate_mean"]))
    assert losses[-1] < losses[0]

    variables = {"params": state.params, **state.model_state}
    pred, _ = model.apply(variables, batch, train=False,
                          method=model.predict,
                          rngs={"sample": jax.random.key(2)})
    assert pred.shape == (2, 3, 64, 64, 1)
    assert np.isfinite(np.asarray(pred)).all()
