"""Tests for the flow trainer, Dreamer datasets, and TP sharding."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ode_rl_tpu.flow import FlowNetS
from ode_rl_tpu.flow.train import synthetic_flow_batch, train_flownet
from ode_rl_tpu.data.sprites import get_sprite_bank
from ode_rl_tpu.wm.datasets import EpisodeLoader, break_batch


def test_synthetic_flow_ground_truth_consistency_smooth():
    """style='smooth': img2 must equal warp(img1, flow) by construction."""
    from ode_rl_tpu.ops.warp import resample2d
    bank = jnp.asarray(get_sprite_bank())
    img1, img2, flow = synthetic_flow_batch(jax.random.key(0), bank,
                                            batch=2, style="smooth")
    np.testing.assert_allclose(np.asarray(img2),
                               np.asarray(resample2d(img1, flow)),
                               atol=1e-6)


def test_synthetic_flow_digits_forward_flow_exact():
    """style='digits' (default): forward flow on frame 1 — for every
    digit pixel whose integer displacement keeps it in bounds and whose
    target pixel isn't occluded by a nearer digit,
    img2[y+dy, x+dx] == img1[y, x] exactly (integer flow, no
    interpolation); background flow is exactly zero."""
    bank = jnp.asarray(get_sprite_bank())
    img1, img2, flow = synthetic_flow_batch(jax.random.key(3), bank,
                                            batch=4)
    i1 = np.asarray(img1)[..., 0]
    i2 = np.asarray(img2)[..., 0]
    fl = np.asarray(flow)                               # (B, H, W, [dx,dy])
    assert fl.shape == i1.shape + (2,)
    assert np.all(fl == np.round(fl))                   # integer GT
    h, w = i1.shape[1:]
    total = exact = 0
    for b in range(i1.shape[0]):
        ys, xs = np.nonzero(i1[b])
        assert len(ys)                                  # digits present
        # background (no digit in frame 1) carries zero flow
        bg = np.ones_like(i1[b], dtype=bool)
        bg[ys, xs] = False
        assert np.all(fl[b][bg] == 0.0)
        for y, x in zip(ys, xs):
            dx, dy = int(fl[b, y, x, 0]), int(fl[b, y, x, 1])
            ty, tx = y + dy, x + dx
            if not (0 <= ty < h and 0 <= tx < w):
                continue
            total += 1
            # max-composite: the moved value lands at the target, so
            # i2 there is >= it always, == it unless a brighter digit
            # occludes the target (or a nearer digit owned the source).
            assert i2[b, ty, tx] >= i1[b, y, x] - 1e-6, (b, y, x)
            exact += int(i2[b, ty, tx] == i1[b, y, x])
    assert total > 500
    assert exact / total > 0.85                         # bulk moves exactly


@pytest.mark.slow
def test_flow_training_runs_and_is_finite():
    m = train_flownet(FlowNetS(), steps=3, batch=2)
    assert np.isfinite(m["loss"]) and np.isfinite(m["epe"])


def test_break_batch():
    v = jnp.arange(2 * 10).reshape(2, 10, 1, 1, 1).astype(jnp.float32)
    out = break_batch(v, 5)
    assert out.shape == (4, 5, 1, 1, 1)
    # chunk 0 of episode 0 = frames 0..4
    np.testing.assert_array_equal(np.asarray(out[0, :, 0, 0, 0]),
                                  np.arange(5))


def test_episode_loader():
    loader = iter(EpisodeLoader(batch_size=4, episode_length=20,
                                batch_length=5))
    b = next(loader)
    assert b["image"].shape == (4, 5, 64, 64, 1)


def test_tp_spec_shards_wide_kernels():
    from ode_rl_tpu.parallel.mesh import make_mesh
    from ode_rl_tpu.parallel.tp import tp_param_spec
    mesh = make_mesh(n_data=4, n_model=2)
    params = {
        "conv": {"kernel": jnp.zeros((3, 3, 32, 128)),
                 "bias": jnp.zeros((128,))},
        "small": {"kernel": jnp.zeros((3, 3, 4, 8))},
    }
    specs = tp_param_spec(params, mesh, min_channels=64)
    assert specs["conv"]["kernel"][-1] == "model"
    assert all(s is None for s in specs["small"]["kernel"])
    assert all(s is None for s in specs["conv"]["bias"])
