"""Imagined-rollout actor-critic (wm/behavior.py).

The reference ships ImagBehavior only as commented-out dead code
(/root/reference/dreamerv2/models.py:198-360); these tests pin our live
implementation: action-conditioned RSSM transitions, rollout shapes,
λ-target math, slow-target schedule, and actual policy improvement on
an action-dependent reward.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ode_rl_tpu.wm.behavior import ActionHead, ImagBehavior, rssm_behavior_fns
from ode_rl_tpu.wm.rssm import RSSM
from ode_rl_tpu.wm.tools import lambda_return


def _tiny_rssm(discrete=8):
    rssm = RSSM(stoch=4, deter=16, hidden=16, discrete=discrete)
    state0 = rssm.initial(3)
    # init with an action so the action-input kernel exists
    params = rssm.init(jax.random.key(0), state0, jax.random.key(1),
                       method=rssm.img_step,
                       action=jnp.zeros((3, 2)))
    return rssm, params, state0


def test_rssm_img_step_action_conditioning():
    """Actions must change the prior transition (reference RSSM always
    concatenates prev_action; ours does when action is passed)."""
    rssm, params, s0 = _tiny_rssm()
    a0 = jnp.zeros((3, 2))
    a1 = jnp.ones((3, 2))
    n0 = rssm.apply(params, s0, jax.random.key(2), action=a0,
                    method=rssm.img_step)
    n1 = rssm.apply(params, s0, jax.random.key(2), action=a1,
                    method=rssm.img_step)
    assert not np.allclose(np.asarray(n0["deter"]), np.asarray(n1["deter"]))
    # same action, same key → deterministic
    n0b = rssm.apply(params, s0, jax.random.key(2), action=a0,
                     method=rssm.img_step)
    np.testing.assert_allclose(np.asarray(n0["deter"]),
                               np.asarray(n0b["deter"]))


def test_imagine_shapes_and_bounds():
    rssm, params, s0 = _tiny_rssm()
    img_step, get_feat = rssm_behavior_fns(rssm, params)
    feat_dim = int(get_feat(s0).shape[-1])
    beh = ImagBehavior(action_dim=2, feat_dim=feat_dim, horizon=5,
                       units=16, layers=2, actor_dist="tanh_normal")
    state = beh.init(jax.random.key(0))
    feats, states, actions = beh.imagine(
        state.actor_params, s0, img_step, get_feat, jax.random.key(1))
    assert feats.shape == (5, 3, feat_dim)
    assert actions.shape == (5, 3, 2)
    assert (np.abs(np.asarray(actions)) <= 1.0).all()
    assert states["deter"].shape == (5, 3, 16)


def test_lambda_target_and_weights_match_manual():
    beh = ImagBehavior(action_dim=2, feat_dim=4, horizon=3, units=8,
                       layers=1, discount=0.9, discount_lambda=0.95)
    state = beh.init(jax.random.key(0))
    feats = jax.random.normal(jax.random.key(1), (4, 2, 4))
    reward = jnp.arange(8, dtype=jnp.float32).reshape(4, 2)
    target, weights = beh._compute_target(
        state.value_params, state.slow_value_params, feats, reward)
    value = beh.value.apply(state.slow_value_params, feats)
    ref = lambda_return(reward[:-1], value[:-1],
                        0.9 * jnp.ones_like(reward[:-1]),
                        bootstrap=value[-1], lambda_=0.95, axis=0)
    np.testing.assert_allclose(np.asarray(target), np.asarray(ref),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(weights[:, 0]),
                               [1.0, 0.9, 0.81, 0.729], rtol=1e-6)


@pytest.mark.parametrize("grad", ["dynamics", "reinforce"])
def test_actor_improves_action_dependent_reward(grad):
    """Reward −(a − 0.6)² must pull the tanh-Gaussian policy toward 0.6
    under both gradient estimators."""
    rssm, params, s0 = _tiny_rssm()
    img_step, get_feat = rssm_behavior_fns(rssm, params)
    feat_dim = int(get_feat(s0).shape[-1])
    beh = ImagBehavior(action_dim=2, feat_dim=feat_dim, horizon=5,
                       units=32, layers=2, actor_dist="tanh_normal",
                       actor_lr=3e-3, value_lr=3e-3, imag_gradient=grad)
    state = beh.init(jax.random.key(0))

    def reward_fn(feats, states, actions):
        return -jnp.sum((actions - 0.6) ** 2, -1)

    step = beh.make_train_step(img_step, get_feat, reward_fn)
    key = jax.random.key(42)
    first = None
    for i in range(60):
        key, k = jax.random.split(key)
        state, metrics = step(state, s0, k)
        if first is None:
            first = float(metrics["reward_mean"])
    last = float(metrics["reward_mean"])
    assert np.isfinite(last)
    assert last > first + 0.1, (first, last)


def test_value_learns_and_slow_target_copies():
    rssm, params, s0 = _tiny_rssm()
    img_step, get_feat = rssm_behavior_fns(rssm, params)
    feat_dim = int(get_feat(s0).shape[-1])
    beh = ImagBehavior(action_dim=2, feat_dim=feat_dim, horizon=4,
                       units=16, layers=2, actor_dist="onehot",
                       slow_target_update=5, value_lr=1e-2)
    state = beh.init(jax.random.key(0))

    def reward_fn(feats, states, actions):
        return jnp.ones(feats.shape[:-1], jnp.float32)

    step = beh.make_train_step(img_step, get_feat, reward_fn)
    key = jax.random.key(7)
    v_losses = []
    for i in range(10):
        key, k = jax.random.split(key)
        state, metrics = step(state, s0, k)
        v_losses.append(float(metrics["value_loss"]))
        slow_eq_live = all(
            np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(
                jax.tree_util.tree_leaves(state.slow_value_params),
                jax.tree_util.tree_leaves(state.value_params)))
        # hard copy exactly at multiples of slow_target_update
        assert slow_eq_live == ((i + 1) % 5 == 0)
    assert v_losses[-1] < v_losses[0]


def test_onehot_head_logprob_and_entropy():
    head = ActionHead(action_dim=3, dist="onehot", units=8, layers=1)
    feat = jnp.ones((2, 4))
    params = head.init(jax.random.key(0), feat)
    stats = head.apply(params, feat)
    a = head.sample(stats, jax.random.key(1))
    assert a.shape == (2, 3)
    np.testing.assert_allclose(np.asarray(jnp.sum(a, -1)), 1.0, atol=1e-5)
    lp = head.log_prob(stats, a)
    assert (np.asarray(lp) <= 0).all()
    ent = head.entropy(stats)
    assert (np.asarray(ent) >= 0).all()
    assert (np.asarray(ent) <= np.log(3) + 1e-5).all()
