#!/usr/bin/env python
"""The full Dreamer RL loop, end-to-end on one chip.

The reference repo is named ODE-RL and vendors DreamerV2, but its RL
half is dead code: the entire actor-critic (ImagBehavior,
dreamerv2/models.py:198-360) is commented out and no environment ships.
This script runs the loop the reference only gestures at:

  1. collect random-policy episodes from the on-device ControlledDigit
     env (wm/envs.py — 2-D velocity actions, x-position reward);
  2. train an action-conditioned world model (ConvEncoder → RSSM with
     actions → image + reward heads) on those episodes;
  3. train the actor-critic purely inside the world model's imagination
     (wm/behavior.py): rollouts through the learned prior, rewards from
     the learned reward head, λ-return targets, slow value target;
  4. evaluate the actor in the real environment against the random
     policy. Success = the imagination-trained actor drives the digit
     right (mean reward well above random's ~0.5).

Usage: python scripts/dreamer_rl_demo.py [--wm_steps 2000]
    [--behavior_steps 600] [--horizon 15]
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--wm_steps", type=int, default=2000)
    ap.add_argument("--behavior_steps", type=int, default=600)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--episode_len", type=int, default=12)
    ap.add_argument("--horizon", type=int, default=15)
    ap.add_argument("--eval_episodes", type=int, default=64)
    ap.add_argument("--eval_len", type=int, default=20)
    ap.add_argument("--report", default="results/round4/dreamer_rl.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from ode_rl_tpu.data.sprites import get_sprite_bank
    from ode_rl_tpu.wm import envs
    from ode_rl_tpu.wm.behavior import ImagBehavior
    from ode_rl_tpu.wm.world_model import WorldModel, world_model_optimizer

    bank = jnp.asarray(get_sprite_bank())
    b, t = args.batch, args.episode_len

    # ------------------------------------------------------------- 1+2.
    wm = WorldModel(image_shape=(64, 64, 1), cnn_depth=16, stoch=16,
                    deter=128, hidden=128, discrete=16, pred_reward=True)
    ep0 = envs.collect_random(jax.random.key(0), bank, batch=b, horizon=t)
    wm_params = wm.init({"params": jax.random.key(1),
                         "sample": jax.random.key(2)}, ep0, method=wm.loss)
    tx = world_model_optimizer(lr=3e-4)
    opt = tx.init(wm_params)

    @jax.jit
    def wm_step(params, opt, key):
        k1, k2 = jax.random.split(key)
        ep = envs.collect_random(k1, bank, batch=b, horizon=t)

        def loss_fn(p):
            loss, (m, _) = wm.apply(p, ep, method=wm.loss,
                                    rngs={"sample": k2})
            return loss, m

        (loss, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, updates), opt, metrics

    key = jax.random.key(42)
    t0 = time.time()
    for i in range(args.wm_steps):
        key, k = jax.random.split(key)
        wm_params, opt, m = wm_step(wm_params, opt, k)
        if (i + 1) % 500 == 0:
            print(f"[wm {i+1}] loss={float(m['loss']):.1f} "
                  f"image={float(m['image_loss']):.1f} "
                  f"reward={float(m['reward_loss']):.4f} "
                  f"kl={float(m['kl']):.2f}")
    wm_seconds = time.time() - t0
    wm_final = {k2: float(v) for k2, v in m.items()
                if not k2.startswith("_")}

    # ---------------------------------------------------------------- 3.
    # Frozen world-model closures for imagination.
    def img_step_fn(state, k, action):
        return wm.apply(wm_params, state, k, action=action,
                        method=lambda mod, *a, **kw:
                        mod.dynamics.img_step(*a, **kw))

    def get_feat_fn(state):
        return wm.apply(wm_params, state,
                        method=lambda mod, s: mod.dynamics.get_feat(s))

    def reward_fn(feats, states, actions):
        return wm.apply(wm_params, feats,
                        method=lambda mod, f: mod.reward_head(f)
                        ).astype(jnp.float32)

    feat_dim = wm.stoch * wm.discrete + wm.deter

    beh = ImagBehavior(action_dim=2, feat_dim=feat_dim,
                       actor_dist="tanh_normal", horizon=args.horizon,
                       units=200, layers=3, actor_lr=1e-4, value_lr=3e-4,
                       imag_gradient="dynamics")
    beh_state = beh.init(jax.random.key(3))
    beh_step = beh.make_train_step(img_step_fn, get_feat_fn, reward_fn)

    @jax.jit
    def start_states(k):
        """Posterior states from a fresh random episode → flattened
        imagination start points (the reference seeds imagination from
        training posteriors, models.py:223-231)."""
        k1, k2 = jax.random.split(k)
        ep = envs.collect_random(k1, bank, batch=b, horizon=t)

        def posts(mod, ep):
            embed = mod.encoder(ep["image"].astype(mod.dtype))
            post, _ = mod.dynamics.observe(embed, mod.make_rng("sample"),
                                           actions=ep["action"])
            return post

        post = wm.apply(wm_params, ep, method=posts, rngs={"sample": k2})
        return jax.tree_util.tree_map(
            lambda v: v.reshape((-1,) + v.shape[2:]), post)

    t0 = time.time()
    for i in range(args.behavior_steps):
        key, k1, k2 = jax.random.split(key, 3)
        beh_state, bm = beh_step(beh_state, start_states(k1), k2)
        if (i + 1) % 150 == 0:
            print(f"[behavior {i+1}] imag_reward="
                  f"{float(bm['reward_mean']):.3f} "
                  f"value_loss={float(bm['value_loss']):.4f} "
                  f"actor_ent={float(bm['actor_ent']):.2f}")
    behavior_seconds = time.time() - t0

    # ---------------------------------------------------------------- 4.
    def make_policy(mode):
        @jax.jit
        def run_eval(k):
            k_reset, k_roll = jax.random.split(k)
            env_state = envs.reset(k_reset, bank, args.eval_episodes)
            rssm_state = wm.apply(
                wm_params, args.eval_episodes,
                method=lambda mod, n: mod.dynamics.initial(n))

            def body(carry, k_t):
                env_state, rssm_state, prev_action = carry
                obs = envs.render(env_state, bank)
                ka, kd = jax.random.split(k_t)

                def obs_step(mod, s, o, kk, a):
                    e = mod.encoder(o[:, None].astype(mod.dtype))[:, 0]
                    post, _ = mod.dynamics.obs_step(s, e, kk, action=a)
                    return post, mod.dynamics.get_feat(post)

                rssm_state, feat = wm.apply(wm_params, rssm_state, obs,
                                            kd, prev_action,
                                            method=obs_step)
                if mode == "actor":
                    stats = beh.actor.apply(beh_state.actor_params, feat)
                    action = beh.actor.mode(stats)
                else:
                    action = jax.random.uniform(
                        ka, (args.eval_episodes, 2), minval=-1.0,
                        maxval=1.0)
                env_state, reward = envs.step(env_state, action)
                return (env_state, rssm_state, action), reward

            keys = jax.random.split(k_roll, args.eval_len)
            _, rewards = jax.lax.scan(
                body, (env_state, rssm_state,
                       jnp.zeros((args.eval_episodes, 2))), keys)
            return jnp.mean(rewards)

        return run_eval

    actor_reward = float(make_policy("actor")(jax.random.key(100)))
    random_reward = float(make_policy("random")(jax.random.key(100)))
    print(f"eval mean reward: actor={actor_reward:.3f} "
          f"random={random_reward:.3f}")

    report = {
        "env": "ControlledDigit (wm/envs.py)",
        "wm_steps": args.wm_steps, "wm_seconds": round(wm_seconds, 1),
        "wm_final": wm_final,
        "behavior_steps": args.behavior_steps,
        "behavior_seconds": round(behavior_seconds, 1),
        "imag_reward_final": float(bm["reward_mean"]),
        "eval_mean_reward_actor": actor_reward,
        "eval_mean_reward_random": random_reward,
        "note": ("full Dreamer RL loop (collect -> action-conditioned "
                 "world model -> imagination-trained actor-critic -> "
                 "env eval); the reference ships this only as "
                 "commented-out code"),
    }
    rp = pathlib.Path(args.report)
    rp.parent.mkdir(parents=True, exist_ok=True)
    rp.write_text(json.dumps(report, indent=2) + "\n")
    print(f"report → {rp}")


if __name__ == "__main__":
    main()
