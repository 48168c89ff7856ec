"""Fused-scan recurrences must be drop-in equal to the flax cell scans.

The fused paths (hoisted input projections, cuDNN-style) keep the exact
param tree of the flax cells they replace — same module path, same
Dense names — so existing checkpoints load unchanged and flax's
path-derived param RNGs give bit-identical initialization. These tests
pin (a) the param-tree equality, (b) forward equality, (c) gradient
equality against an inline reimplementation of the original
``nn.scan``-of-``nn.GRUCell`` structure.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ode_rl_tpu.nn.s3vae_nets import _GRU


class _RefGRU(nn.Module):
    """The pre-fusion _GRU: nn.scan over nn.GRUCell (kept verbatim as
    the oracle)."""

    hidden: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xs, h0=None):
        b = xs.shape[0]
        cell = nn.GRUCell(features=self.hidden, dtype=self.dtype,
                          param_dtype=self.param_dtype, name="cell")
        scan = nn.scan(
            lambda c, h, x: c(h, x),
            variable_broadcast="params", split_rngs={"params": False},
            in_axes=1, out_axes=1)
        if h0 is None:
            h0 = jnp.zeros((b, self.hidden), self.dtype)
        h_last, outs = scan(cell, h0, xs)
        return outs, h_last


def _trees_equal(a, b):
    la = jax.tree_util.tree_leaves_with_path(a)
    lb = jax.tree_util.tree_leaves_with_path(b)
    assert [p for p, _ in la] == [p for p, _ in lb]
    return all(np.array_equal(np.asarray(x), np.asarray(y))
               for (_, x), (_, y) in zip(la, lb))


@pytest.fixture(scope="module")
def gru_setup():
    key = jax.random.key(0)
    xs = jax.random.normal(jax.random.key(1), (3, 7, 12))
    fused = _GRU(hidden=16)
    ref = _RefGRU(hidden=16)
    p_fused = fused.init(key, xs)
    p_ref = ref.init(key, xs)
    return fused, ref, p_fused, p_ref, xs


def test_fused_gru_param_tree_identical(gru_setup):
    _, _, p_fused, p_ref, _ = gru_setup
    assert _trees_equal(p_fused, p_ref), (
        "fused _GRU must init bit-identically to nn.GRUCell "
        "(same path-derived RNGs)")


def test_fused_gru_forward_matches_cell_scan(gru_setup):
    fused, ref, p_fused, p_ref, xs = gru_setup
    outs_f, h_f = fused.apply(p_fused, xs)
    outs_r, h_r = ref.apply(p_ref, xs)
    np.testing.assert_allclose(np.asarray(outs_f), np.asarray(outs_r),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(h_f), np.asarray(h_r),
                               rtol=1e-6, atol=1e-6)


def test_fused_gru_forward_with_h0(gru_setup):
    fused, ref, p_fused, p_ref, xs = gru_setup
    h0 = jax.random.normal(jax.random.key(2), (3, 16))
    outs_f, _ = fused.apply(p_fused, xs, h0=h0)
    outs_r, _ = ref.apply(p_ref, xs, h0=h0)
    np.testing.assert_allclose(np.asarray(outs_f), np.asarray(outs_r),
                               rtol=1e-6, atol=1e-6)


def test_fused_gru_gradients_match(gru_setup):
    fused, ref, p_fused, p_ref, xs = gru_setup

    def loss(mod, p):
        outs, h = mod.apply(p, xs)
        return jnp.sum(outs ** 2) + jnp.sum(jnp.abs(h))

    g_f = jax.grad(lambda p: loss(fused, p))(p_fused)
    g_r = jax.grad(lambda p: loss(ref, p))(p_ref)
    fa = jax.tree_util.tree_leaves_with_path(g_f)
    ra = jax.tree_util.tree_leaves_with_path(g_r)
    assert [p for p, _ in fa] == [p for p, _ in ra]
    for (path, x), (_, y) in zip(fa, ra):
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), rtol=1e-5, atol=1e-6,
            err_msg=f"grad mismatch at {path}")


class _ConvScanPair(nn.Module):
    """Scan + free-run over ConvGRU cells, fused vs unfused."""

    fused: bool = True

    @nn.compact
    def __call__(self, xs, mask=None):
        from ode_rl_tpu.nn.convgru import (ConvGRUCell, convgru_freerun,
                                           convgru_scan)
        cell = ConvGRUCell(hidden_dim=8, kernel_size=3, name="cell")
        dyn = ConvGRUCell(hidden_dim=8, kernel_size=3, name="dyn")
        h0 = jnp.zeros(xs.shape[:1] + xs.shape[2:-1] + (8,))
        hs, h_last = convgru_scan(cell, h0, xs, mask=mask, fused=self.fused)
        roll, _ = convgru_freerun(dyn, h_last, 4, fused=self.fused)
        return hs, roll


@pytest.fixture(scope="module")
def conv_setup():
    xs = jax.random.normal(jax.random.key(1), (2, 5, 6, 6, 4))
    mask = jnp.array([[1, 1, 0, 1, 1], [1, 0, 1, 1, 0]], jnp.float32)
    m_f, m_u = _ConvScanPair(fused=True), _ConvScanPair(fused=False)
    p_f = m_f.init(jax.random.key(0), xs)
    p_u = m_u.init(jax.random.key(0), xs)
    return m_f, m_u, p_f, p_u, xs, mask


def test_fused_convgru_param_tree_identical(conv_setup):
    _, _, p_f, p_u, _, _ = conv_setup
    assert _trees_equal(p_f, p_u), (
        "fused ConvGRU scans must keep the nn.Conv param tree bit-identical"
        " (checkpoint compatibility)")


def test_fused_convgru_scan_and_freerun_match(conv_setup):
    m_f, m_u, p_f, p_u, xs, mask = conv_setup
    # conv(concat) vs conv_x + conv_h splits the channel reduction in two
    # partial sums — equality is up to that fp32 reassociation.
    for a, b in zip(m_f.apply(p_f, xs, mask), m_u.apply(p_u, xs, mask)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)


def test_fused_convgru_gradients_match(conv_setup):
    m_f, m_u, p_f, p_u, xs, mask = conv_setup

    def loss(m, p):
        hs, roll = m.apply(p, xs, mask)
        return jnp.sum(hs ** 2) + jnp.sum(roll ** 2)

    g_f = jax.grad(lambda p: loss(m_f, p))(p_f)
    g_u = jax.grad(lambda p: loss(m_u, p))(p_u)
    for (path, x), (_, y) in zip(
            jax.tree_util.tree_leaves_with_path(g_f),
            jax.tree_util.tree_leaves_with_path(g_u)):
        # GroupNorm backward cancels catastrophically on a few elements;
        # 0.5% relative on isolated leaves is fp32 reassociation noise
        # (a wrong kernel slice would be O(1) everywhere).
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=5e-3, atol=1e-4,
                                   err_msg=str(path))


class _LSTMScanPair(nn.Module):
    fused: bool = True

    @nn.compact
    def __call__(self, xs):
        from ode_rl_tpu.models.convlstm import ConvLSTMCell, _scan_cell
        cell = ConvLSTMCell(num_features=8, filter_size=3, name="cell")
        zero = jnp.zeros(xs.shape[:1] + xs.shape[2:-1] + (8,))
        carry, hs = _scan_cell(cell, (zero, zero), xs, xs.shape[1],
                               fused=self.fused)
        _, roll = _scan_cell(cell, carry, None, 4, fused=self.fused)
        return hs, roll


@pytest.fixture(scope="module")
def lstm_setup():
    # Same cell drives both the input scan and the free-run, so the
    # input width must equal num_features (the ConvLSTMED decoder
    # contract: stage conv output == cell features).
    xs = jax.random.normal(jax.random.key(1), (2, 5, 6, 6, 8))
    m_f, m_u = _LSTMScanPair(fused=True), _LSTMScanPair(fused=False)
    p_f = m_f.init(jax.random.key(0), xs)
    p_u = m_u.init(jax.random.key(0), xs)
    return m_f, m_u, p_f, p_u, xs


def test_fused_convlstm_param_tree_identical(lstm_setup):
    _, _, p_f, p_u, _ = lstm_setup
    assert _trees_equal(p_f, p_u)


def test_fused_convlstm_scan_and_freerun_match(lstm_setup):
    m_f, m_u, p_f, p_u, xs = lstm_setup
    for a, b in zip(m_f.apply(p_f, xs), m_u.apply(p_u, xs)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)


def test_fused_convlstm_gradients_match(lstm_setup):
    m_f, m_u, p_f, p_u, xs = lstm_setup

    def loss(m, p):
        hs, roll = m.apply(p, xs)
        return jnp.sum(hs ** 2) + jnp.sum(roll ** 2)

    g_f = jax.grad(lambda p: loss(m_f, p))(p_f)
    g_u = jax.grad(lambda p: loss(m_u, p))(p_u)
    for (path, x), (_, y) in zip(
            jax.tree_util.tree_leaves_with_path(g_f),
            jax.tree_util.tree_leaves_with_path(g_u)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=5e-3, atol=1e-4,
                                   err_msg=str(path))


@pytest.mark.parametrize("discrete", [0, 8])
@pytest.mark.parametrize("with_actions", [False, True])
def test_rssm_observe_hoisted_matches_obs_step_loop(discrete, with_actions):
    """observe()'s hoisted posterior projection (embed-side columns of
    obi0 computed for all T before the scan) must reproduce the per-step
    obs_step loop — the split of concat([deter, embed]) @ K into two
    matmuls only reassociates the fp32 reduction."""
    from ode_rl_tpu.wm import RSSM

    rssm = RSSM(stoch=6, deter=16, hidden=16, discrete=discrete)
    b, t = 2, 5
    embed = jax.random.normal(jax.random.key(0), (b, t, 24))
    actions = (jax.random.normal(jax.random.key(4), (b, t, 3))
               if with_actions else None)
    key = jax.random.key(3)
    v = rssm.init(jax.random.key(1), embed, jax.random.key(2),
                  actions=actions, method=rssm.observe)
    post, prior = rssm.apply(v, embed, key, actions=actions,
                             method=rssm.observe)

    # Manual loop over obs_step with the exact same key split order.
    def loop(v, embed, key):
        state = rssm.apply(v, b, method=rssm.initial)
        keys = jax.random.split(key, t)
        posts, priors = [], []
        for i in range(t):
            a_i = None if actions is None else actions[:, i]
            state, pri = rssm.apply(v, state, embed[:, i], keys[i],
                                    action=a_i, method=rssm.obs_step)
            posts.append(state)
            priors.append(pri)
        stack = lambda lst: jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs, 1), *lst)
        return stack(posts), stack(priors)

    post_ref, prior_ref = loop(v, embed, key)
    for got, want in ((post, post_ref), (prior, prior_ref)):
        for k in got:
            np.testing.assert_allclose(
                np.asarray(got[k]), np.asarray(want[k]),
                rtol=2e-5, atol=2e-6, err_msg=k)


class _RefLSTM(nn.Module):
    """The pre-fusion _LSTM: nn.scan over nn.OptimizedLSTMCell."""

    hidden: int
    reverse: bool = False

    @nn.compact
    def __call__(self, xs):
        b = xs.shape[0]
        cell = nn.OptimizedLSTMCell(features=self.hidden, name="cell")
        scan = nn.scan(lambda c, carry, x: c(carry, x),
                       variable_broadcast="params",
                       split_rngs={"params": False}, in_axes=1, out_axes=1,
                       reverse=self.reverse)
        carry0 = cell.initialize_carry(jax.random.key(0),
                                       (b, xs.shape[-1]))
        _, outs = scan(cell, carry0, xs)
        return outs


@pytest.mark.parametrize("reverse", [False, True])
def test_fused_lstm_matches_cell_scan(reverse):
    from ode_rl_tpu.sprite.dsvae import _LSTM

    xs = jax.random.normal(jax.random.key(1), (3, 7, 12))
    fused = _LSTM(hidden=16, reverse=reverse)
    ref = _RefLSTM(hidden=16, reverse=reverse)
    p_f = fused.init(jax.random.key(0), xs)
    p_r = ref.init(jax.random.key(0), xs)
    assert _trees_equal(p_f, p_r), "param tree / init must be identical"
    np.testing.assert_allclose(
        np.asarray(fused.apply(p_f, xs)), np.asarray(ref.apply(p_r, xs)),
        rtol=1e-6, atol=1e-6)
    g_f = jax.grad(lambda p: jnp.sum(fused.apply(p, xs) ** 2))(p_f)
    g_r = jax.grad(lambda p: jnp.sum(ref.apply(p, xs) ** 2))(p_r)
    for (path, x), (_, y) in zip(
            jax.tree_util.tree_leaves_with_path(g_f),
            jax.tree_util.tree_leaves_with_path(g_r)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-5, atol=1e-6, err_msg=str(path))
