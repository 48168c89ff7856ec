"""Tests for the flow trainer, Dreamer datasets, and TP sharding."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ode_rl_tpu.flow import FlowNetS
from ode_rl_tpu.flow.train import synthetic_flow_batch, train_flownet
from ode_rl_tpu.data.sprites import get_sprite_bank
from ode_rl_tpu.wm.datasets import EpisodeLoader, break_batch


def test_synthetic_flow_ground_truth_consistency():
    """img2 must equal warp(img1, flow) by construction."""
    from ode_rl_tpu.ops.warp import resample2d
    bank = jnp.asarray(get_sprite_bank())
    img1, img2, flow = synthetic_flow_batch(jax.random.key(0), bank,
                                            batch=2)
    np.testing.assert_allclose(np.asarray(img2),
                               np.asarray(resample2d(img1, flow)),
                               atol=1e-6)


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
