"""Tests for Vid-ODE samplers, video transforms, LPIPS, and visuals."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from ode_rl_tpu.data import video_transforms as vt
from ode_rl_tpu.data.samplers import (
    sample, sample_irregular_extrap, sample_irregular_interp,
    sample_regular_extrap, sample_regular_interp, split_batch)
from ode_rl_tpu.eval_models.lpips import init_lpips, lpips_distance


def _video(b=2, t=24):
    return jax.random.uniform(jax.random.key(0), (b, t, 16, 16, 1)) - 0.5


# ------------------------------- samplers ---------------------------------

def test_regular_interp_train_halves_frames():
    frames, mask = sample_regular_interp(jax.random.key(1), _video(),
                                         sample_size=10, train=True)
    assert frames.shape[1] == 5
    assert (np.asarray(mask) == 1).all()


def test_regular_interp_test_mask_pattern():
    frames, mask = sample_regular_interp(jax.random.key(1), _video(),
                                         sample_size=10, train=False)
    assert frames.shape[1] == 10
    m = np.asarray(mask[0])
    assert (m[::2] == 1).all() and (m[1::2] == 0).all()


def test_regular_extrap_full_window():
    frames, mask = sample_regular_extrap(jax.random.key(1), _video(),
                                         sample_size=10)
    assert frames.shape[1] == 10
    assert (np.asarray(mask) == 1).all()


def test_irregular_interp_mask_count_and_endpoints():
    frames, mask = sample_irregular_interp(jax.random.key(1), _video(),
                                           sample_size=6, window_size=12)
    assert frames.shape[1] == 12
    m = np.asarray(mask)
    assert (m.sum(-1) == 6).all()            # exactly sample_size observed
    assert (m[:, 0] == 1).all() and (m[:, -1] == 1).all()


def test_irregular_extrap_mask_halves():
    frames, mask = sample_irregular_extrap(jax.random.key(1), _video(),
                                           sample_size=8, window_size=12)
    m = np.asarray(mask)
    assert (m.sum(-1) == 8).all()
    assert (m[:, :6].sum(-1) == 4).all()     # half in each window half
    assert (m[:, 6:].sum(-1) == 4).all()


def test_sampler_dispatch_and_split():
    frames, mask = sample(jax.random.key(2), _video(), sample_size=10,
                          irregular=False, extrap=True)
    batch = split_batch(frames, mask, extrap=True)
    assert batch["observed_data"].shape[1] == 5
    assert batch["data_to_predict"].shape[1] == 5
    batch_i = split_batch(frames, mask, extrap=False)
    assert batch_i["data_to_predict"].shape[1] == 10


# ------------------------------ transforms --------------------------------

def test_transforms_shapes_and_determinism():
    clip = jax.random.uniform(jax.random.key(0), (4, 32, 32, 3))
    assert vt.scale(clip, (16, 16)).shape == (4, 16, 16, 3)
    assert vt.center_crop(clip, (20, 20)).shape == (4, 20, 20, 3)
    assert vt.pad(clip, 2).shape == (4, 36, 36, 3)
    assert vt.random_crop(jax.random.key(1), clip, (24, 24)).shape == \
        (4, 24, 24, 3)
    # same key → same crop (video-level consistency)
    a = vt.random_crop(jax.random.key(1), clip, (24, 24))
    b = vt.random_crop(jax.random.key(1), clip, (24, 24))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_flip_applies_to_all_frames():
    clip = jax.random.uniform(jax.random.key(0), (3, 8, 8, 1))
    flipped = vt.random_horizontal_flip(jax.random.key(3), clip, p=1.0)
    np.testing.assert_allclose(np.asarray(flipped),
                               np.asarray(clip[:, :, ::-1]))


def test_cutout_same_hole_every_frame():
    clip = jnp.ones((3, 16, 16, 1))
    out = vt.cutout(jax.random.key(0), clip, size=4)
    holes = np.asarray(out == 0)
    assert holes.sum() == 3 * 4 * 4      # one 4×4 hole per frame
    np.testing.assert_array_equal(holes[0], holes[1])


def test_color_jitter_range():
    clip = jax.random.uniform(jax.random.key(0), (2, 8, 8, 3))
    out = vt.color_jitter(jax.random.key(1), clip)
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0


def test_rotation_preserves_shape():
    clip = jax.random.uniform(jax.random.key(0), (2, 16, 16, 1))
    out = vt.random_rotation(jax.random.key(1), clip, degrees=15.0)
    assert out.shape == clip.shape


# -------------------------------- LPIPS -----------------------------------

@pytest.mark.slow
def test_lpips_zero_for_identical_and_positive_else():
    variables = init_lpips()
    a = jax.random.uniform(jax.random.key(0), (2, 64, 64, 3))
    b = jax.random.uniform(jax.random.key(1), (2, 64, 64, 3))
    d_same = lpips_distance(variables, a, a)
    d_diff = lpips_distance(variables, a, b)
    np.testing.assert_allclose(np.asarray(d_same), 0.0, atol=1e-5)
    assert (np.asarray(d_diff) > 0).all()


@pytest.mark.slow
def test_lpips_monotone_in_noise():
    variables = init_lpips()
    a = jax.random.uniform(jax.random.key(0), (1, 64, 64, 3))
    small = jnp.clip(a + 0.05 * jax.random.normal(jax.random.key(2),
                                                  a.shape), 0, 1)
    big = jnp.clip(a + 0.5 * jax.random.normal(jax.random.key(3),
                                               a.shape), 0, 1)
    assert float(lpips_distance(variables, a, small)[0]) < float(
        lpips_distance(variables, a, big)[0])


# ------------------------------- visuals ----------------------------------

def test_filmstrip_and_plot(tmp_path):
    from ode_rl_tpu.train.visualize import (
        plot_metrics_vs_horizon, save_filmstrip)
    vid = np.random.rand(5, 16, 16, 1)
    p = save_filmstrip(tmp_path / "sheet.png", [vid, vid])
    assert p.exists() and p.stat().st_size > 0
    p2 = plot_metrics_vs_horizon(
        tmp_path / "mh.png",
        {"mse": [0.1, 0.2], "psnr": [20, 18], "ssim": [0.9, 0.8]})
    assert p2.exists()
    assert p2.with_suffix(".json").exists()
