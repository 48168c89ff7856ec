"""On-device Moving MNIST generation.

Behavioral parity with the reference's on-the-fly generator
(reference dataloader.py:47-103): digits bounce in a 64×64 canvas with
``step_length = 0.1``, integer pixel placement, ``np.maximum`` compositing,
and the position is stepped *before* the first recorded frame.

TPU-first differences (deliberate):
  * fully vectorized and jittable — a whole batch is generated on-device
    from a single PRNG key, so the input pipeline never touches the host
    (the reference pays cv2 decode / Python DataLoader workers per item);
  * bounce is computed in closed form with a triangle-wave reflection
    instead of the reference's per-step clamp loop — identical physics for
    constant-velocity elastic reflection, no sequential dependency.
"""

from __future__ import annotations

import functools
from typing import Iterator, Optional

import jax
import jax.numpy as jnp

from ode_rl_tpu.data.sprites import DIGIT_SIZE, get_sprite_bank

IMAGE_SIZE = 64
STEP_LENGTH = 0.1
_CANVAS = IMAGE_SIZE - DIGIT_SIZE  # 36


def _reflect01(x: jnp.ndarray) -> jnp.ndarray:
    """Triangle wave: reflect x into [0, 1] (elastic bounce off both walls)."""
    m = jnp.mod(x, 2.0)
    return 1.0 - jnp.abs(m - 1.0)


def _trajectories(key: jax.Array, n_frames: int) -> jnp.ndarray:
    """Pixel positions (n_frames, 2) int32 for one digit.

    Position is advanced one step before the first recorded frame, matching
    the reference generator's step-then-record loop.
    """
    k1, k2, k3 = jax.random.split(key, 3)
    x0 = jax.random.uniform(k1)
    y0 = jax.random.uniform(k2)
    theta = jax.random.uniform(k3) * 2.0 * jnp.pi
    v = jnp.stack([jnp.sin(theta), jnp.cos(theta)])  # (vy, vx)
    t = jnp.arange(1, n_frames + 1, dtype=jnp.float32)[:, None]  # step first
    pos = _reflect01(jnp.stack([y0, x0])[None, :] + v[None, :] * t * STEP_LENGTH)
    return (pos * _CANVAS).astype(jnp.int32)  # truncation, like astype(int32)


def _place_all(sprite: jnp.ndarray, tops: jnp.ndarray,
               lefts: jnp.ndarray) -> jnp.ndarray:
    """Place a 28×28 sprite at per-frame integer positions (single-level
    vmapped dynamic_update_slice)."""

    def place(top, left):
        canvas = jnp.zeros((IMAGE_SIZE, IMAGE_SIZE), dtype=sprite.dtype)
        return jax.lax.dynamic_update_slice(canvas, sprite, (top, left))

    return jax.vmap(place)(tops, lefts)


@functools.partial(jax.jit, static_argnames=("batch", "n_frames", "num_digits"))
def generate_moving_mnist(
    key: jax.Array,
    sprite_bank: jnp.ndarray,
    batch: int,
    n_frames: int,
    num_digits: int = 2,
) -> jnp.ndarray:
    """Generate (batch, n_frames, 64, 64, 1) float32 video in [-0.5, 0.5].

    NHWC layout; the [-0.5, 0.5] range matches what the reference's
    DataLoader emits (reference dataloader.py:219-220).
    """
    return _generate(key, sprite_bank, batch, n_frames, num_digits)[0]


@functools.partial(jax.jit, static_argnames=("batch", "n_frames", "num_digits"))
def generate_moving_mnist_labeled(
    key: jax.Array,
    sprite_bank: jnp.ndarray,
    batch: int,
    n_frames: int,
    num_digits: int = 1,
):
    """Labeled variant for disentanglement probes: returns
    (video, sprite_idx (B, D) int32, positions (B, D, T, 2) int32).
    Sprite identity is the content factor; the position trajectory is
    the motion factor (the generator's two independent sources)."""
    video, idx, pos, _ = _generate(key, sprite_bank, batch, n_frames,
                                   num_digits)
    return (video, idx.reshape(batch, num_digits),
            pos.reshape(batch, num_digits, n_frames, 2))


def _generate(key, sprite_bank, batch, n_frames, num_digits):
    n_bank = sprite_bank.shape[0]
    sprite_bank = sprite_bank.astype(jnp.float32)

    # Placement as two one-hot batched matmuls over ALL (batch × digit ×
    # frame) placements at once: canvas = OHy · sprite · OHxᵀ where
    # OHy[p, y, a] = 1 iff y == top_p + a. Measured 2.1 ms at batch 128 ×
    # 20 frames × 3 digits vs ~38 ms for vmapped dynamic_update_slice
    # (TPU lowers batched dynamic-offset updates to a serialized scatter)
    # — this is MXU work instead. Exact for uint8 sprite values: each
    # output element has exactly one nonzero product of a {0,1} weight
    # with a value ≤ 255, representable in bf16.
    bd = batch * num_digits
    p = bd * n_frames
    keys = jax.random.split(key, bd * 2).reshape(bd, 2)
    pos = jax.vmap(lambda k: _trajectories(k, n_frames))(keys[:, 0])
    idx = jax.vmap(
        lambda k: jax.random.randint(k, (), 0, n_bank))(keys[:, 1])
    sprites = sprite_bank[idx]                                # (B·D, 28, 28)
    sprites = jnp.broadcast_to(
        sprites[:, None], (bd, n_frames, DIGIT_SIZE, DIGIT_SIZE)
    ).reshape(p, DIGIT_SIZE, DIGIT_SIZE)

    flat_pos = pos.reshape(p, 2)
    iy = jax.lax.broadcasted_iota(jnp.int32, (IMAGE_SIZE, DIGIT_SIZE), 0)
    ia = jax.lax.broadcasted_iota(jnp.int32, (IMAGE_SIZE, DIGIT_SIZE), 1)
    ohy = (iy[None] == flat_pos[:, 0, None, None] + ia[None]
           ).astype(jnp.float32)                              # (P, 64, 28)
    ohx = (iy[None] == flat_pos[:, 1, None, None] + ia[None]
           ).astype(jnp.float32)
    placed = jnp.einsum("pya,pab->pyb", ohy, sprites)
    placed = jnp.einsum("pyb,pxb->pyx", placed, ohx)          # (P, 64, 64)
    per_digit = placed.reshape(batch, num_digits, n_frames,
                               IMAGE_SIZE, IMAGE_SIZE)
    video = jnp.max(per_digit, axis=1)                        # compositing
    # Clamp: XLA turns /255 into a reciprocal multiply, which can land an
    # ulp above 1.0 for saturated pixels.
    video = jnp.clip(video[..., None] / 255.0 - 0.5, -0.5, 0.5)
    return video, idx, pos, per_digit


@functools.partial(jax.jit,
                   static_argnames=("batch", "n_frames", "num_digits"))
def generate_moving_mnist_per_digit(
    key: jax.Array,
    sprite_bank: jnp.ndarray,
    batch: int,
    n_frames: int,
    num_digits: int = 3,
):
    """Per-digit canvases BEFORE max-compositing: returns
    (per_digit (B, D, T, 64, 64) float32 in [0, 255],
    sprite_idx (B, D) int32, positions (B, D, T, 2) int32). Used by the
    piecewise-translation flow generator (flow/train.py), which needs
    per-pixel digit occupancy to assign each pixel the motion of the
    digit in front of it."""
    _, idx, pos, per_digit = _generate(key, sprite_bank, batch, n_frames,
                                       num_digits)
    return (per_digit, idx.reshape(batch, num_digits),
            pos.reshape(batch, num_digits, n_frames, 2))


class MovingMNIST:
    """Infinite batched iterator over generated Moving MNIST sequences.

    Capability parity with the reference's ``MovingMNIST`` Dataset +
    ``inf_generator`` pair; per-host sharding folds ``jax.process_index()``
    into the stream key so multi-host training sees disjoint data.
    """

    def __init__(
        self,
        batch_size: int,
        n_frames_input: int,
        n_frames_output: int,
        num_digits: int = 2,
        data_dir: Optional[str] = None,
        seed: int = 0,
        is_train: bool = True,
        num_sprites: int = 0,
    ):
        self.batch_size = batch_size
        self.n_frames_input = n_frames_input
        self.n_frames_output = n_frames_output
        self.n_frames_total = n_frames_input + n_frames_output
        self.num_digits = num_digits
        bank = get_sprite_bank(data_dir)
        if num_sprites:
            # Restricted identity vocabulary (disentanglement probes:
            # sprite index becomes a judgeable content class).
            bank = bank[:num_sprites]
        self.sprite_bank = jnp.asarray(bank)
        base = jax.random.key(seed if is_train else seed + 77_000_003)
        self._key = jax.random.fold_in(base, jax.process_index())

    def __iter__(self) -> Iterator[jnp.ndarray]:
        return self

    def __next__(self) -> jnp.ndarray:
        self._key, sub = jax.random.split(self._key)
        return generate_moving_mnist(
            sub,
            self.sprite_bank,
            batch=self.batch_size,
            n_frames=self.n_frames_total,
            num_digits=self.num_digits,
        )


class _VideoOnly:
    """Adapter dropping labels from a labeled video stream."""

    def __init__(self, inner):
        self._inner = iter(inner)

    def __iter__(self):
        return self

    def __next__(self):
        out = next(self._inner)
        return out[0] if isinstance(out, tuple) else out


def parse_datasets(cfg) -> dict:
    """Build train/test loader objects (same contract as the reference's
    ``parse_datasets`` → dict with loaders and batch counts)."""
    if cfg.dataset == "sprites":
        from ode_rl_tpu.sprite.data import SpritesLoader
        if cfg.get("phase", "train") == "train":
            n_frames = int(cfg.train_in_seq) + int(cfg.train_out_seq)
        else:
            n_frames = int(cfg.test_in_seq) + int(cfg.test_out_seq)
        mk = lambda seed: _VideoOnly(SpritesLoader(
            batch_size=cfg.batch_size, n_frames=n_frames,
            data_dir=cfg.get("data_dir"), seed=seed))
        total = int(cfg.get("data_points", 10000))
        train_n = int(cfg.get("train_test_split", 0.8) * total)
        return {
            "train_dataloader": mk(cfg.get("seed", 0)),
            "test_dataloader": mk(cfg.get("seed", 0) + 99),
            "n_train_batches": max(train_n // cfg.batch_size, 1),
            "n_test_batches": max((total - train_n) // cfg.batch_size, 1),
        }
    from ode_rl_tpu.data.video_corpus import DATASET_SPECS, parse_video_corpus
    if cfg.dataset in DATASET_SPECS:
        # Vid-ODE external datasets (kth/mgif/penn/hurricane/phyre/minerl
        # + mmnist_video): frozen per-video npy corpora
        # (reference Vid-ODE/dataloader.py:225-340).
        return parse_video_corpus(cfg)
    if cfg.dataset != "mmnist":
        raise NotImplementedError(
            f"There is no dataset named {cfg.dataset}")
    total_instances = int(cfg.get("data_points", 10000))
    train_instances = int(cfg.get("train_test_split", 0.8) * total_instances)
    test_instances = total_instances - train_instances

    # Frozen mode (reference dataloader.py:105-199): pre-rendered videos
    # from disk when available (scripts/make_frozen_mmnist.py); otherwise
    # on-the-fly on-device generation.
    import pathlib
    frozen_root = pathlib.Path(str(cfg.get("data_dir", "")))
    _has_mp4 = lambda r: any(
        list(d.glob("video_*.mp4"))
        for d in (r, r / "train") if d.is_dir())
    if cfg.get("frozen", False) and ((frozen_root / "meta.json").exists()
                                     or _has_mp4(frozen_root)):
        from ode_rl_tpu.data.frozen import FrozenMovingMNIST
        mk = lambda train: iter(FrozenMovingMNIST(
            frozen_root, batch_size=cfg.batch_size,
            n_frames_input=cfg.train_in_seq if train else cfg.test_in_seq,
            n_frames_output=(cfg.train_out_seq if train
                             else cfg.test_out_seq),
            is_train=train, seed=cfg.get("seed", 0)))
        return {
            "train_dataloader": mk(True),
            "test_dataloader": mk(False),
            "n_train_batches": max(train_instances // cfg.batch_size, 1),
            "n_test_batches": max(test_instances // cfg.batch_size, 1),
            "frozen": True,
        }

    train_loader = MovingMNIST(
        batch_size=cfg.batch_size,
        n_frames_input=cfg.train_in_seq,
        n_frames_output=cfg.train_out_seq,
        num_digits=cfg.num_digits,
        data_dir=cfg.get("data_dir"),
        seed=cfg.get("seed", 0),
        is_train=True,
        num_sprites=int(cfg.get("num_sprites", 0) or 0),
    )
    test_loader = MovingMNIST(
        batch_size=cfg.batch_size,
        n_frames_input=cfg.test_in_seq,
        n_frames_output=cfg.test_out_seq,
        num_digits=cfg.num_digits,
        data_dir=cfg.get("data_dir"),
        seed=cfg.get("seed", 0),
        is_train=False,
        num_sprites=int(cfg.get("num_sprites", 0) or 0),
    )
    return {
        "train_dataloader": iter(train_loader),
        "test_dataloader": iter(test_loader),
        "n_train_batches": max(train_instances // cfg.batch_size, 1),
        "n_test_batches": max(test_instances // cfg.batch_size, 1),
    }
