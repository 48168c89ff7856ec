#!/usr/bin/env python
"""S3VAE disentanglement quantification on Moving MNIST (VERDICT r3 #2).

Ports the sprite disagreement protocol (reference
code_sprite/test_DS_VAE_Sprite_Cls_disagree.py) to the flagship S3VAE:

  1. train a judge classifier on labeled 1-digit Moving MNIST (sprite
     identity = content factor; start/end canvas quadrant = motion
     factor) — labels come from the generator itself
     (data/mmnist.py generate_moving_mnist_labeled);
  2. restore each trained S3VAE checkpoint (the 4-term model and the
     l1=l2=l3=0 ablation, trained at matched steps), decode latent
     swaps: (z_f of A, z_t of donor) and (z_f of donor, z_t of A);
  3. judge the swaps. Disentanglement = content follows z_f's source and
     motion follows z_t's source; the SCC/DFP/MI terms (reference
     models/S3VAE.py:365-449) should move these metrics vs the ablation.

Usage:
  python scripts/mmnist_disentangle.py \
      --ckpt_full s3vae_r4_full --ckpt_abl s3vae_r4_ablation \
      [--judge_steps 1500] [--eval_batches 16] \
      [--out results/round4/s3vae_disentangle.json]
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

N_SPRITES = 16


def train_judge(bank, steps: int, batch: int = 64, n_frames: int = 20):
    import jax
    import jax.numpy as jnp
    import optax

    from ode_rl_tpu.data.mmnist import generate_moving_mnist_labeled
    from ode_rl_tpu.eval_models.mmnist_judge import (MMNISTJudge,
                                                     quadrant_labels)

    judge = MMNISTJudge(n_sprites=N_SPRITES)
    tx = optax.adam(1e-3)

    def draw(key):
        video, idx, pos = generate_moving_mnist_labeled(
            key, bank, batch=batch, n_frames=n_frames, num_digits=1)
        q0, q1 = quadrant_labels(pos)
        return video + 0.5, idx[:, 0], q0, q1

    key = jax.random.key(0)
    v, s, q0, q1 = draw(key)
    params = judge.init(jax.random.key(1), v, s, q0, q1,
                        method=judge.loss)["params"]
    opt = tx.init(params)

    # Datagen FUSED into the jitted step (one XLA program, one dispatch
    # per step — the framework's fused-step pattern): the eager per-step
    # draw() was ~10 dispatches/step through the remote tunnel and
    # dominated judge training wall-clock.
    @jax.jit
    def step(params, opt, key):
        key, sub = jax.random.split(key)
        v, s, q0, q1 = draw(sub)
        (loss, m), g = jax.value_and_grad(
            lambda p: judge.apply({"params": p}, v, s, q0, q1,
                                  method=judge.loss), has_aux=True)(params)
        up, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, up), opt, m, key

    m = {}
    for i in range(steps):
        params, opt, m, key = step(params, opt, key)
        if i % 250 == 0 or i == steps - 1:
            mm = {k: round(float(x), 4) for k, x in m.items()}
            print(f"judge step {i}: {mm}", flush=True)
    final = {k: float(x) for k, x in m.items()}
    return judge, params, final


_judge_fwd_cache = {}


def judge_accs(judge, jparams, video, sprite, q0, q1):
    """Per-head accuracy of the judge on ``video`` vs given labels.
    The judge forward is jitted once per process (eager flax apply is
    one dispatch per op through the remote tunnel — dominated the swap
    eval wall-clock)."""
    import jax
    import jax.numpy as jnp

    if "fwd" not in _judge_fwd_cache:
        _judge_fwd_cache["fwd"] = jax.jit(
            lambda p, v: judge.apply({"params": p}, jnp.clip(v, 0.0, 1.0)))
    logits = _judge_fwd_cache["fwd"](jparams, jnp.asarray(video))
    acc = lambda lg, y: float(np.mean(
        np.argmax(np.asarray(lg), -1) == np.asarray(y)))
    return {"sprite": acc(logits["sprite"], sprite),
            "q0": acc(logits["q0"], q0), "q1": acc(logits["q1"], q1)}


def restore_s3vae(ckpt_id: str):
    """Restore a trained S3VAE (train-config resurrection, the Vid-ODE
    options.json pattern)."""
    import jax

    from ode_rl_tpu.core.checkpoint import CheckpointManager, find_checkpoint
    from ode_rl_tpu.core.config import Config
    from ode_rl_tpu.models import build_model

    ckpt_dir = find_checkpoint("logs", "S3VAE", ckpt_id)
    ckpt = CheckpointManager(ckpt_dir, tag=ckpt_id)
    cfg = Config(ckpt.load_config())
    model = build_model(cfg)

    from ode_rl_tpu.data import MovingMNIST, make_batch_dict
    loader = iter(MovingMNIST(batch_size=2,
                              n_frames_input=cfg.train_in_seq,
                              n_frames_output=cfg.train_out_seq,
                              num_digits=int(cfg.get("num_digits", 1)),
                              num_sprites=int(cfg.get("num_sprites", 0))))
    sample = make_batch_dict(next(loader), n_in=cfg.train_in_seq,
                             with_flow_labels=True)
    variables = model.init(
        {"params": jax.random.key(0), "sample": jax.random.key(1)},
        sample, train=True, method=model.loss)
    # Train loop snapshots {params, model_state, opt_state} at top level
    # (train/loop.py ckpt.save); restore into that structure directly.
    target = {"params": variables["params"],
              "model_state": {k: v for k, v in variables.items()
                              if k != "params"}}
    restored = ckpt.restore(target)
    state = restored["state"]
    return model, cfg, {"params": state["params"], **state["model_state"]}


def eval_swaps(model, cfg, variables, judge, jparams, bank,
               n_batches: int, batch: int = 32):
    """Decode latent swaps on labeled videos and judge them."""
    import jax
    import jax.numpy as jnp

    from ode_rl_tpu.data.mmnist import generate_moving_mnist_labeled
    from ode_rl_tpu.data.protocol import make_batch_dict
    from ode_rl_tpu.eval_models.mmnist_judge import quadrant_labels

    t = int(cfg.train_in_seq) + int(cfg.train_out_seq)
    n_in = int(cfg.train_in_seq)

    @jax.jit
    def swap_decode(key, data_key):
        video, idx, pos = generate_moving_mnist_labeled(
            data_key, bank, batch=batch, n_frames=t, num_digits=1)
        bd = make_batch_dict(video, n_in=n_in, with_flow_labels=True)
        # train=True so the decode covers the OBSERVED window (predict's
        # eval path decodes the extrapolation window instead); BN then
        # runs in batch-stats mode, so the collection must be declared
        # mutable — the updates are discarded (probe, not training).
        (x_hat, aux), _ = model.apply(variables, bd, train=True, swap=True,
                                      method=model.predict,
                                      rngs={"sample": key},
                                      mutable=["batch_stats"])
        return video, idx, pos, x_hat, aux

    tallies = {k: [] for k in (
        "real", "recon",
        "swapm_content_own", "swapm_motion_donor", "swapm_motion_own",
        "swapc_content_donor", "swapc_content_own", "swapc_motion_own")}
    key = jax.random.key(42)
    for i in range(n_batches):
        key, k1, k2 = jax.random.split(key, 3)
        video, idx, pos, x_hat, aux = swap_decode(k1, k2)
        sprite = np.asarray(idx[:, 0])
        # In train mode the model decodes the OBSERVED window (out_seq ==
        # n_in), so every judged tensor and both motion labels are taken
        # over frames [0, n_in).
        q0, q1 = map(np.asarray, quadrant_labels(pos[:, :, :n_in]))
        donor = lambda a: np.roll(a, 1, axis=0)   # model rolls by 1
        vid01 = np.asarray(video)[:, :n_in] + 0.5

        accs = lambda x, s, a, b: judge_accs(judge, jparams, x, s, a, b)
        tallies["real"].append(accs(vid01, sprite, q0, q1))
        tallies["recon"].append(accs(np.asarray(x_hat)[:, :n_in],
                                     sprite, q0, q1))
        xm = np.asarray(aux["x_swap_motion"])[:, :n_in]  # own zf, donor zt
        xc = np.asarray(aux["x_swap_content"])[:, :n_in]  # donor zf, own zt
        tallies["swapm_content_own"].append(
            accs(xm, sprite, q0, q1)["sprite"])
        tallies["swapm_motion_donor"].append(
            accs(xm, sprite, donor(q0), donor(q1)))
        tallies["swapm_motion_own"].append(accs(xm, sprite, q0, q1))
        tallies["swapc_content_donor"].append(
            accs(xc, donor(sprite), q0, q1)["sprite"])
        tallies["swapc_content_own"].append(
            accs(xc, sprite, q0, q1)["sprite"])
        tallies["swapc_motion_own"].append(accs(xc, sprite, q0, q1))

    def agg(rows):
        if isinstance(rows[0], dict):
            return {k: round(float(np.mean([r[k] for r in rows])), 4)
                    for k in rows[0]}
        return round(float(np.mean(rows)), 4)

    out = {k: agg(v) for k, v in tallies.items()}
    # Headline asymmetry numbers.
    out["content_preserved_under_motion_swap"] = out["swapm_content_own"]
    out["motion_transferred_under_motion_swap"] = (
        (out["swapm_motion_donor"]["q0"]
         + out["swapm_motion_donor"]["q1"]) / 2.0)
    out["content_transferred_under_content_swap"] = out[
        "swapc_content_donor"]
    out["motion_preserved_under_content_swap"] = (
        (out["swapc_motion_own"]["q0"] + out["swapc_motion_own"]["q1"])
        / 2.0)
    return out


def latent_probes(model, cfg, variables, bank, n_train_batches: int = 64,
                  n_eval_batches: int = 16, batch: int = 64,
                  probe_steps: int = 600):
    """Content-axis measurement that bypasses decoder fidelity (VERDICT
    r4 #4): train small MLP probes to read each factor off each latent
    and report the full decodability matrix

        acc(identity | zf)   acc(identity | zt)
        acc(motion   | zf)   acc(motion   | zt)

    Disentanglement = the diagonal is high and the off-diagonal low
    (identity lives in zf only, motion in zt only — the factorization the
    SCC/DFP/MI terms exist to enforce, reference models/S3VAE.py:365-449).
    Probes see mu_zf (B, d_zf) and time-pooled [mean‖std over T] of mu_zt;
    labels come from the generator (sprite index; start/end quadrants)."""
    import jax
    import jax.numpy as jnp
    import optax

    from ode_rl_tpu.data.mmnist import generate_moving_mnist_labeled
    from ode_rl_tpu.data.protocol import make_batch_dict
    from ode_rl_tpu.eval_models.mmnist_judge import quadrant_labels

    t = int(cfg.train_in_seq) + int(cfg.train_out_seq)
    n_in = int(cfg.train_in_seq)

    @jax.jit
    def encode(key, data_key):
        video, idx, pos = generate_moving_mnist_labeled(
            data_key, bank, batch=batch, n_frames=t, num_digits=1)
        bd = make_batch_dict(video, n_in=n_in, with_flow_labels=True)
        (_x, aux), _ = model.apply(variables, bd, train=True,
                                   method=model.predict,
                                   rngs={"sample": key},
                                   mutable=["batch_stats"])
        zf = aux["mu_zf"].astype(jnp.float32)
        zt = aux["mu_zt"].astype(jnp.float32)
        zt_feat = jnp.concatenate(
            [jnp.mean(zt, axis=1), jnp.std(zt, axis=1)], axis=-1)
        q0, q1 = quadrant_labels(pos[:, :, :n_in])
        return zf, zt_feat, idx[:, 0], q0, q1

    key = jax.random.key(7)
    feats = {"zf": [], "zt": []}
    labels = {"sprite": [], "q0": [], "q1": []}
    for i in range(n_train_batches + n_eval_batches):
        key, k1, k2 = jax.random.split(key, 3)
        zf, zt_feat, idx, q0, q1 = encode(k1, k2)
        feats["zf"].append(np.asarray(zf))
        feats["zt"].append(np.asarray(zt_feat))
        labels["sprite"].append(np.asarray(idx))
        labels["q0"].append(np.asarray(q0))
        labels["q1"].append(np.asarray(q1))
    cut = n_train_batches
    cat = lambda rows: np.concatenate(rows, axis=0)
    tr = {k: cat(v[:cut]) for k, v in feats.items()}
    te = {k: cat(v[cut:]) for k, v in feats.items()}
    ltr = {k: cat(v[:cut]) for k, v in labels.items()}
    lte = {k: cat(v[cut:]) for k, v in labels.items()}

    def fit_probe(x_tr, y_tr, x_te, y_te, n_classes):
        """2-layer MLP probe, full-batch Adam."""
        import flax.linen as nn

        class Probe(nn.Module):
            @nn.compact
            def __call__(self, x):
                x = jax.nn.relu(nn.Dense(128)(x))
                return nn.Dense(n_classes)(x)

        probe = Probe()
        # Standardize features so probe training is conditioning-free.
        m, s = x_tr.mean(0), x_tr.std(0) + 1e-6
        x_tr_n = jnp.asarray((x_tr - m) / s)
        x_te_n = jnp.asarray((x_te - m) / s)
        y_tr_j = jnp.asarray(y_tr)
        params = probe.init(jax.random.key(0), x_tr_n)
        tx = optax.adam(3e-3)
        opt = tx.init(params)

        # All probe_steps full-batch updates as ONE lax.scan program
        # (one dispatch instead of probe_steps tunnel roundtrips), and
        # the eval forward jitted with it.
        @jax.jit
        def train_and_eval(params, opt):
            def body(carry, _):
                params, opt = carry

                def loss_fn(p):
                    logits = probe.apply(p, x_tr_n)
                    return optax.softmax_cross_entropy_with_integer_labels(
                        logits, y_tr_j).mean()

                g = jax.grad(loss_fn)(params)
                up, opt2 = tx.update(g, opt, params)
                return (optax.apply_updates(params, up), opt2), 0.0

            (params, _), _ = jax.lax.scan(body, (params, opt), None,
                                          length=probe_steps)
            return jnp.argmax(probe.apply(params, x_te_n), -1)

        pred = np.asarray(train_and_eval(params, opt))
        return float((pred == y_te).mean())

    out = {}
    for lat in ("zf", "zt"):
        out[f"identity_from_{lat}"] = round(fit_probe(
            tr[lat], ltr["sprite"], te[lat], lte["sprite"], N_SPRITES), 4)
        q0a = fit_probe(tr[lat], ltr["q0"], te[lat], lte["q0"], 4)
        q1a = fit_probe(tr[lat], ltr["q1"], te[lat], lte["q1"], 4)
        out[f"motion_from_{lat}"] = round((q0a + q1a) / 2.0, 4)
    out["chance_identity"] = round(1.0 / N_SPRITES, 4)
    out["chance_motion"] = 0.25
    # Headline: how much MORE decodable each factor is from its own
    # latent than from the other (≥0 = factorized, ~0 = entangled).
    out["content_axis_margin"] = round(
        out["identity_from_zf"] - out["identity_from_zt"], 4)
    out["motion_axis_margin"] = round(
        out["motion_from_zt"] - out["motion_from_zf"], 4)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt_full", default="s3vae_r4_full")
    ap.add_argument("--ckpt_abl", default="s3vae_r4_ablation")
    ap.add_argument("--judge_steps", type=int, default=1500)
    ap.add_argument("--eval_batches", type=int, default=16)
    ap.add_argument("--out", default="results/round4/s3vae_disentangle.json")
    args = ap.parse_args()

    import jax.numpy as jnp

    from ode_rl_tpu.data.sprites import get_sprite_bank

    bank = jnp.asarray(get_sprite_bank()[:N_SPRITES])
    judge, jparams, judge_final = train_judge(bank, args.judge_steps)

    report = {"judge_train_final": judge_final,
              "n_sprites": N_SPRITES, "models": {}}
    for tag, ckpt_id in (("full_4term", args.ckpt_full),
                         ("ablation_l123_0", args.ckpt_abl)):
        print(f"== evaluating {tag} ({ckpt_id})", flush=True)
        model, cfg, variables = restore_s3vae(ckpt_id)
        report["models"][tag] = eval_swaps(
            model, cfg, variables, judge, jparams, bank,
            n_batches=args.eval_batches)
        report["models"][tag]["latent_probes"] = latent_probes(
            model, cfg, variables, bank)
        report["models"][tag]["ckpt_id"] = ckpt_id
        report["models"][tag]["loss_weights"] = {
            "l1": float(cfg.get("l1")), "l2": float(cfg.get("l2")),
            "l3": float(cfg.get("l3"))}
        print(json.dumps(report["models"][tag], indent=2), flush=True)

    out = pathlib.Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(report, indent=2) + "\n")
    print(f"report → {out}")


if __name__ == "__main__":
    main()
