#!/usr/bin/env python
"""DS-VAE disentanglement disagreement scores (sprites).

The reference's evaluation protocol
(/root/reference/code_sprite/test_DS_VAE_Sprite_Cls_disagree.py):
restore a trained DS-VAE, train a judge classifier, then

  * generate videos with the ACTION pinned (posterior motion means) and
    the content resampled from N(0, I) — judge the action on the
    original vs the generation and score acc / KL / IS / H(y|x) / H(y);
  * generate videos with the CONTENT pinned (posterior content mean)
    and the motion resampled from the learned prior — same sweep.

A disentangled model keeps action agreement HIGH under content
resampling and LOW under motion resampling. The judge here is the
latent-space SpriteJudge trained on posterior latents of real videos;
generations are re-encoded through the frozen DS-VAE before judging
(the in-image equivalent of the reference's raw-video classifier).

Usage: python scripts/sprite_disagreement.py [--steps 400] [--batches 8]
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

os.environ.setdefault("JAX_PLATFORMS", os.environ.get("JAX_PLATFORMS",
                                                      "axon"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--logdir", default="logs")
    ap.add_argument("--ckpt_id", default="train_sprite_dsvae")
    ap.add_argument("--steps", type=int, default=400,
                    help="judge training steps")
    ap.add_argument("--batches", type=int, default=8,
                    help="eval batches for the disagreement sweep")
    ap.add_argument("--batch_size", type=int, default=64)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default="results/round3/sprite_disagreement.json")
    args = ap.parse_args()

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    import optax
    from flax import serialization

    from ode_rl_tpu.core.checkpoint import find_checkpoint
    from ode_rl_tpu.sprite.classifier import SpriteJudge
    from ode_rl_tpu.sprite.data import sprites_batch
    from ode_rl_tpu.sprite.disagreement import disagreement_scores
    from ode_rl_tpu.sprite.dsvae import DisentangledVAE

    # ---- restore the trained DS-VAE --------------------------------------
    ckpt_dir = find_checkpoint(args.logdir, "DSVAE", args.ckpt_id)
    ckpts = sorted(ckpt_dir.glob(f"{args.ckpt_id}_*.ckpt"))
    raw = serialization.msgpack_restore(ckpts[-1].read_bytes())
    params = raw["state"]["params"]
    model_state = raw["state"].get("model_state", {})
    cfg_path = ckpt_dir / f"{args.ckpt_id}_config.json"
    saved = json.loads(cfg_path.read_text()) if cfg_path.exists() else {}
    model = DisentangledVAE(
        f_dim=int(saved.get("f_dim", 256)), z_dim=int(saved.get("z_dim", 32)),
        g_dim=int(saved.get("g_dim", 128)),
        channels=int(saved.get("in_channels", 3)),
        hidden_dim=int(saved.get("rnn_size", 256)))
    n_frames = int(saved.get("train_in_seq", 8))
    print(f"restored DS-VAE from {ckpts[-1]} (step {raw['step']})")

    mvars = {"params": params, **model_state}

    def encode(x, key):
        f_mean, _, _, z_mean, _, _ = model.apply(
            mvars, x, key, train=False,
            method=model.encode_and_sample_post)
        return z_mean, f_mean

    encode = jax.jit(encode)
    gen_fixed_action = jax.jit(lambda x, k: model.apply(
        mvars, x, train=False, rngs={"sample": k},
        method=model.forward_fixed_action_for_classification)[0])
    gen_fixed_content = jax.jit(lambda x, k: model.apply(
        mvars, x, train=False, rngs={"sample": k},
        method=model.forward_fixed_content_for_classification)[0])

    # ---- train the judge on posterior latents of real videos -------------
    judge = SpriteJudge(hidden=128)
    key = jax.random.key(0)
    key, k0, k1 = jax.random.split(key, 3)
    x0, a0, c0 = sprites_batch(k0, args.batch_size, n_frames)
    z0, f0 = encode(x0, k1)
    jv = judge.init(jax.random.key(1), z0, f0, a0, c0, method=judge.loss)
    tx = optax.adam(1e-3)
    opt = tx.init(jv["params"])

    @jax.jit
    def judge_step(p, opt, z, f, a, c):
        (loss, metrics), g = jax.value_and_grad(
            lambda q: judge.apply({"params": q}, z, f, a, c,
                                  method=judge.loss), has_aux=True)(p)
        up, opt = tx.update(g, opt, p)
        return optax.apply_updates(p, up), opt, metrics

    jp = jv["params"]
    for step in range(args.steps):
        key, kd, ke = jax.random.split(key, 3)
        x, a, c = sprites_batch(kd, args.batch_size, n_frames)
        z, f = encode(x, ke)
        jp, opt, m = judge_step(jp, opt, z, f, a, c)
        if step % 100 == 0 or step == args.steps - 1:
            print(f"judge step {step}: "
                  f"action_acc={float(m['action_acc']):.3f} "
                  f"attr_acc={float(m['attr_acc']):.3f}")

    action_probs = jax.jit(lambda z, f: jax.nn.softmax(
        judge.apply({"params": jp}, z, f)[0].astype(jnp.float32)))

    # ---- disagreement sweeps ---------------------------------------------
    sweeps = {"fixed_action_resampled_content": gen_fixed_action,
              "fixed_content_resampled_motion": gen_fixed_content}
    results = {}
    for name, gen in sweeps.items():
        p1s, p2s, gts = [], [], []
        for i in range(args.batches):
            key, kd, ke, kg, kr = jax.random.split(key, 5)
            x, a, _c = sprites_batch(kd, args.batch_size, n_frames)
            z, f = encode(x, ke)
            p1s.append(np.asarray(action_probs(z, f)))
            x_gen = gen(x, kg)
            z2, f2 = encode(x_gen, kr)
            p2s.append(np.asarray(action_probs(z2, f2)))
            gts.append(np.asarray(a))
        results[name] = disagreement_scores(
            np.concatenate(p1s), np.concatenate(p2s), np.concatenate(gts))
        print(name, json.dumps(results[name]))

    out = pathlib.Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(
        {"ckpt_step": int(raw["step"]), "judge_steps": args.steps,
         **results}, indent=2))
    print("wrote", out)


if __name__ == "__main__":
    main()
