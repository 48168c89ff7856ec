import jax
import jax.numpy as jnp
import numpy as np

from ode_rl_tpu.data import (
    MovingMNIST, generate_moving_mnist, get_sprite_bank, make_batch_dict,
    motion_grid_labels, timestamps_for)


def test_sprite_bank_shape_and_range():
    bank = get_sprite_bank()
    assert bank.shape[1:] == (28, 28)
    assert bank.dtype == np.uint8
    assert bank.max() > 100  # bright strokes exist


def test_generate_shapes_and_range():
    bank = jnp.asarray(get_sprite_bank())
    video = generate_moving_mnist(jax.random.key(0), bank, batch=3,
                                  n_frames=7, num_digits=2)
    assert video.shape == (3, 7, 64, 64, 1)
    assert float(video.min()) >= -0.5 and float(video.max()) <= 0.5
    # digits actually move: consecutive frames differ
    assert float(jnp.abs(video[:, 1] - video[:, 0]).max()) > 0.1


def test_generation_deterministic_in_key():
    bank = jnp.asarray(get_sprite_bank())
    a = generate_moving_mnist(jax.random.key(7), bank, 2, 4)
    b = generate_moving_mnist(jax.random.key(7), bank, 2, 4)
    c = generate_moving_mnist(jax.random.key(8), bank, 2, 4)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert float(jnp.abs(a - c).max()) > 0


def test_loader_iterates_fresh_batches():
    loader = iter(MovingMNIST(batch_size=2, n_frames_input=3,
                              n_frames_output=2))
    v1, v2 = next(loader), next(loader)
    assert v1.shape == (2, 5, 64, 64, 1)
    assert float(jnp.abs(v1 - v2).max()) > 0


def test_timestamps_protocol():
    obs, pred = timestamps_for(10, 10)
    assert obs.shape == (10,) and pred.shape == (10,)
    np.testing.assert_allclose(np.asarray(obs),
                               np.arange(10) / 20.0, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(pred),
                               np.arange(10, 20) / 20.0, rtol=1e-6)


def test_batch_dict_split():
    video = jnp.zeros((2, 8, 64, 64, 1))
    batch = make_batch_dict(video, n_in=5)
    assert batch["observed_data"].shape == (2, 5, 64, 64, 1)
    assert batch["data_to_predict"].shape == (2, 3, 64, 64, 1)
    assert batch["observed_tp"].shape == (5,)
    assert batch["tp_to_predict"].shape == (3,)


def test_flow_labels_multihot():
    video = jax.random.uniform(jax.random.key(0), (2, 6, 64, 64, 1))
    labels = motion_grid_labels(video, grid=3, topk=3)
    assert labels.shape == (2, 5, 9)
    sums = np.asarray(labels.sum(axis=-1))
    assert (sums >= 3).all()  # at least k cells marked (ties can add more)


def test_batch_dict_with_flow_labels():
    video = jax.random.uniform(jax.random.key(1), (2, 10, 64, 64, 1)) - 0.5
    batch = make_batch_dict(video, n_in=5, with_flow_labels=True)
    assert batch["in_flow_labels"].shape == (2, 4, 9)
