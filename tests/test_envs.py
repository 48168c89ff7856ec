"""ControlledDigit environment + action-conditioned world model.

Pins the missing-RL-loop pieces added in round 4: env step/render
semantics, RSSM.observe action threading, and the world model's reward
head (the reference's heads['reward'], dreamerv2/models.py:28-30).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ode_rl_tpu.wm import envs
from ode_rl_tpu.wm.rssm import RSSM
from ode_rl_tpu.wm.world_model import WorldModel


def _bank():
    from ode_rl_tpu.data.sprites import get_sprite_bank
    return jnp.asarray(get_sprite_bank())


def test_env_step_reward_and_bounds():
    bank = _bank()
    state = envs.reset(jax.random.key(0), bank, batch=4)
    right = jnp.tile(jnp.array([[1.0, 0.0]]), (4, 1))
    for _ in range(20):
        state, reward = envs.step(state, right)
    # driving right saturates x at POS_MAX → reward 1
    np.testing.assert_allclose(np.asarray(reward), 1.0, atol=1e-6)
    assert (np.asarray(state["pos"]) <= envs.POS_MAX + 1e-6).all()
    obs = envs.render(state, bank)
    assert obs.shape == (4, 64, 64, 1)
    assert -0.5 <= float(obs.min()) and float(obs.max()) <= 0.5
    # digit sits at the right edge: left half empty
    assert float(jnp.abs(obs[:, :, :32] + 0.5).max()) < 1e-6


def test_collect_random_episode_format():
    bank = _bank()
    ep = envs.collect_random(jax.random.key(1), bank, batch=3, horizon=6)
    assert ep["image"].shape == (3, 6, 64, 64, 1)
    assert ep["action"].shape == (3, 6, 2)
    assert ep["reward"].shape == (3, 6)
    # a_0 is the zero action paired with the reset observation
    np.testing.assert_allclose(np.asarray(ep["action"][:, 0]), 0.0)
    # deterministic regeneration
    ep2 = envs.collect_random(jax.random.key(1), bank, batch=3, horizon=6)
    np.testing.assert_allclose(np.asarray(ep["image"]),
                               np.asarray(ep2["image"]))


def test_observe_with_actions_changes_posterior():
    rssm = RSSM(stoch=4, deter=16, hidden=16, discrete=8)
    embed = jax.random.normal(jax.random.key(0), (2, 5, 32))
    a0 = jnp.zeros((2, 5, 2))
    a1 = jnp.ones((2, 5, 2))
    params = rssm.init(jax.random.key(1), embed, jax.random.key(2),
                       actions=a0, method=rssm.observe)
    post0, _ = rssm.apply(params, embed, jax.random.key(3), actions=a0,
                          method=rssm.observe)
    post1, _ = rssm.apply(params, embed, jax.random.key(3), actions=a1,
                          method=rssm.observe)
    assert post0["deter"].shape == (2, 5, 16)
    assert not np.allclose(np.asarray(post0["deter"]),
                           np.asarray(post1["deter"]))


def test_world_model_action_reward_loss_finite():
    bank = _bank()
    ep = envs.collect_random(jax.random.key(2), bank, batch=2, horizon=4)
    wm = WorldModel(image_shape=(64, 64, 1), cnn_depth=8, stoch=4,
                    deter=16, hidden=16, discrete=8, pred_reward=True)
    params = wm.init({"params": jax.random.key(0),
                      "sample": jax.random.key(1)}, ep, method=wm.loss)
    loss, (metrics, pred) = wm.apply(params, ep, method=wm.loss,
                                     rngs={"sample": jax.random.key(2)})
    assert np.isfinite(float(loss))
    assert "reward_loss" in metrics and np.isfinite(
        float(metrics["reward_loss"]))
    assert pred.shape == ep["image"].shape
