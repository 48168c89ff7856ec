"""Multi-host data-sharding semantics, simulated by patching
``jax.process_index`` / ``jax.process_count`` to a 2-process world.

The reference has no multi-host story at all (SURVEY §2.9); ours is the
standard JAX one — every process feeds its own disjoint slice of the
global batch, and the mesh/NamedSharding layer treats the union as the
global array. These tests pin the per-process contracts the loaders
promise:

  * FrozenMovingMNIST partitions on-disk shards round-robin by process:
    disjoint, covering, and stable (frozen.py:87-88);
  * generator-backed loaders (MovingMNIST, EpisodeLoader) fold the
    process index into their stream keys so two processes never draw the
    same videos (mmnist.py:172, wm/datasets.py:43-44);
  * the same process re-created is deterministic (resume safety).
"""

import numpy as np
import pytest


@pytest.fixture
def two_proc(monkeypatch):
    """Return a setter that pins (process_index, process_count)."""
    import jax

    def set_proc(idx: int, count: int = 2):
        monkeypatch.setattr(jax, "process_index", lambda: idx)
        monkeypatch.setattr(jax, "process_count", lambda: count)

    return set_proc


@pytest.fixture
def frozen_root(tmp_path):
    """Tiny 4-shard frozen corpus in make_frozen_mmnist.py's layout."""
    rng = np.random.RandomState(0)
    (tmp_path / "train").mkdir()
    for i in range(4):
        shard = rng.randint(0, 255, size=(3, 24, 64, 64), dtype=np.uint8)
        np.save(tmp_path / "train" / f"shard_{i:04d}.npy", shard)
    (tmp_path / "meta.json").write_text('{"n_frames": 24}')
    return tmp_path


def test_frozen_shards_partition_disjoint_covering(two_proc, frozen_root):
    from ode_rl_tpu.data.frozen import FrozenMovingMNIST

    views = []
    for idx in range(2):
        two_proc(idx)
        dl = FrozenMovingMNIST(frozen_root, batch_size=2,
                               n_frames_input=4, n_frames_output=4)
        views.append({p.name for p in dl.shards})
    assert views[0] & views[1] == set()
    assert views[0] | views[1] == {f"shard_{i:04d}.npy" for i in range(4)}
    # round-robin: process 0 gets even shards, process 1 odd
    assert views[0] == {"shard_0000.npy", "shard_0002.npy"}


def test_frozen_more_processes_than_shards_falls_back(two_proc, frozen_root):
    """A process whose slice is empty must still be able to train (the
    `or self.shards` fallback) rather than crash on an empty list."""
    from ode_rl_tpu.data.frozen import FrozenMovingMNIST

    two_proc(5, count=8)  # only 4 shards exist
    dl = FrozenMovingMNIST(frozen_root, batch_size=2,
                           n_frames_input=4, n_frames_output=4)
    assert len(dl.shards) == 4
    batch = next(iter(dl))
    assert batch.shape == (2, 8, 64, 64, 1)


def test_frozen_window_rng_differs_per_process(two_proc, frozen_root):
    """Even with the shard-fallback both processes sampling the same
    shard files, the window RNG is seeded by process index so the
    batches differ (frozen.py:94)."""
    from ode_rl_tpu.data.frozen import FrozenMovingMNIST

    batches = []
    for idx in range(2):
        two_proc(idx, count=8)  # both fall back to all 4 shards
        dl = FrozenMovingMNIST(frozen_root, batch_size=2,
                               n_frames_input=4, n_frames_output=4)
        batches.append(np.asarray(next(iter(dl))))
    assert not np.array_equal(batches[0], batches[1])


def test_mmnist_streams_disjoint_and_deterministic(two_proc):
    from ode_rl_tpu.data.mmnist import MovingMNIST

    def first_batch(idx):
        two_proc(idx)
        dl = MovingMNIST(batch_size=2, n_frames_input=3, n_frames_output=3,
                         num_digits=1, seed=7)
        return np.asarray(next(iter(dl)))

    b0, b1, b0_again = first_batch(0), first_batch(1), first_batch(0)
    assert not np.array_equal(b0, b1)           # processes draw differently
    np.testing.assert_array_equal(b0, b0_again)  # same process: deterministic


def test_episode_loader_streams_disjoint(two_proc):
    from ode_rl_tpu.wm.datasets import EpisodeLoader

    def first_images(idx):
        two_proc(idx)
        dl = EpisodeLoader(batch_size=2, episode_length=8, batch_length=4,
                           num_digits=1, seed=3)
        return np.asarray(next(iter(dl))["image"])

    i0, i1 = first_images(0), first_images(1)
    assert i0.shape == i1.shape
    assert not np.array_equal(i0, i1)
