"""Generic frozen-video corpus — the Vid-ODE external dataset layer.

Capability parity with the reference's VideoDataset / HurricaneVideoDataset
(/root/reference/Vid-ODE/dataloader.py:225-340): per-video ``.npy`` files
(T, H, W, C) under ``<root>/{train,test}/``, per-dataset transform specs
(mgif Scale128 / kth CenterCrop120→Scale / penn Scale128 / phyre Scale64 /
minerl Scale64 / hurricane 6-channel Pad(1,0)), train-time
flip+rotation augmentation, short-video filtering
(remove_files_under_sample_size, dataloader.py:206-222), and the
``input_norm`` [0,1]→[-1,1]… here the framework-wide [-0.5, 0.5] batch
convention (reference ToTensor(scale)+Normalize(0.5,0.5) maps to [-1,1];
models here add +0.5 onto [-0.5,0.5] inputs — one consistent range).

The corpus feeds the window samplers (data/samplers.py ≙ reference
Dataset_base.sampling) through the train loop's ``vidode_sampling`` path:
the loader yields window_size-frame clips; sampling/splitting happens
downstream (split_and_subsample_batch ≙ samplers.split_batch).

TPU-first: file IO is host-side numpy (mmap) but the whole transform
pipeline (resize / crop / pad / flip / rotation / normalize) is one jitted
XLA program over the uint8 batch — the reference runs per-frame PIL/cv2
transforms in DataLoader workers.

Corpora are produced by scripts/convert_mp4_to_npy.py,
scripts/generate_phyre_dataset.py, or scripts/make_synthetic_corpus.py
(synthetic stand-ins for environments without the source datasets).
"""

from __future__ import annotations

import functools
import pathlib
from typing import Dict, Iterator, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ode_rl_tpu.data import video_transforms as vt

# Per-dataset transform specs (reference dataloader.py:238-263, 185-205).
# size: final square resolution (None → cfg.resolution); crop: center-crop
# before scaling; pad_lr: left/right pixel padding (hurricane's 63→65
# width fix); channels: enforced channel count (hurricane keeps 6 of its
# stacked fields when six_channels, else 3); augment: train-time
# flip+rotation (the reference skips it for mmnist and hurricane).
DATASET_SPECS: Dict[str, Dict] = {
    "mgif":      dict(size=128, crop=None, pad_lr=0, channels=3, augment=True),
    "kth":       dict(size=None, crop=120, pad_lr=0, channels=1, augment=True),
    "penn":      dict(size=128, crop=None, pad_lr=0, channels=3, augment=True),
    "phyre":     dict(size=64, crop=None, pad_lr=0, channels=3, augment=True),
    "minerl":    dict(size=64, crop=None, pad_lr=0, channels=3, augment=True),
    "hurricane": dict(size=None, crop=None, pad_lr=1, channels=6,
                      augment=False),
    "mmnist_video": dict(size=64, crop=None, pad_lr=0, channels=1,
                         augment=False),
}


def corpus_datasets() -> List[str]:
    return sorted(DATASET_SPECS)


@functools.partial(jax.jit, static_argnames=("spec_key", "size", "train"))
def _transform_batch(key, clips: jnp.ndarray, spec_key: str, size: int,
                     train: bool) -> jnp.ndarray:
    """uint8 (B, T, H, W, C) → float32 [-0.5, 0.5] at (size, size)."""
    spec = DATASET_SPECS[spec_key]
    x = clips.astype(jnp.float32) / 255.0

    def one(clip, k):
        if spec["pad_lr"]:
            p = spec["pad_lr"]
            clip = jnp.pad(clip, ((0, 0), (0, 0), (p, p), (0, 0)))
        if spec["crop"]:
            clip = vt.center_crop(clip, (spec["crop"], spec["crop"]))
        if clip.shape[1] != size or clip.shape[2] != size:
            clip = vt.scale(clip, (size, size))
        if train and spec["augment"]:
            kf, kr = jax.random.split(k)
            clip = vt.random_horizontal_flip(kf, clip)
            clip = vt.random_rotation(kr, clip, degrees=10.0)
        return clip

    keys = jax.random.split(key, x.shape[0])
    return jax.vmap(one)(x, keys) - 0.5


class VideoCorpus:
    """Iterator over window clips of a frozen per-video npy corpus."""

    def __init__(self, root, dataset: str, batch_size: int, clip_len: int,
                 is_train: bool = True, resolution: int = 64,
                 seed: int = 0, augment: Optional[bool] = None):
        if dataset not in DATASET_SPECS:
            raise NotImplementedError(
                f"There is no dataset named {dataset} "
                f"(video corpora: {corpus_datasets()})")
        self.dataset = dataset
        self.spec = DATASET_SPECS[dataset]
        self.size = int(self.spec["size"] or resolution)
        self.batch_size = batch_size
        self.clip_len = clip_len
        self.train = is_train
        self.augment = self.spec["augment"] if augment is None else augment
        split = "train" if is_train else "test"
        self.root = pathlib.Path(root) / split
        files = sorted(self.root.glob("*.npy"))
        if not files:
            raise FileNotFoundError(
                f"no .npy videos under {self.root}; build the corpus with "
                "scripts/convert_mp4_to_npy.py, "
                "scripts/generate_phyre_dataset.py or "
                "scripts/make_synthetic_corpus.py")
        # Filter videos shorter than the window (reference
        # remove_files_under_sample_size, dataloader.py:206-222).
        self.files, dropped = [], 0
        for f in files:
            if np.load(f, mmap_mode="r").shape[0] >= clip_len:
                self.files.append(f)
            else:
                dropped += 1
        if dropped:
            print(f"{dataset}/{split}: removed {dropped:03d} videos shorter "
                  f"than {clip_len} frames")
        if not self.files:
            raise ValueError(
                f"all videos under {self.root} are shorter than "
                f"clip_len={clip_len}")
        self._rng = np.random.RandomState(seed)
        self._key = jax.random.key(seed + (0 if is_train else 7))
        self._cursor = 0

    def __len__(self) -> int:
        return max(len(self.files) // self.batch_size, 1)

    def __iter__(self) -> Iterator[jnp.ndarray]:
        return self

    def _pick_files(self) -> List[pathlib.Path]:
        if self.train:
            idx = self._rng.randint(0, len(self.files), self.batch_size)
        else:  # deterministic sequential sweep
            idx = [(self._cursor + i) % len(self.files)
                   for i in range(self.batch_size)]
            self._cursor = (self._cursor + self.batch_size) % len(self.files)
        return [self.files[i] for i in idx]

    def __next__(self) -> jnp.ndarray:
        clips = []
        c = self.spec["channels"]
        for f in self._pick_files():
            video = np.load(f, mmap_mode="r")
            start = (self._rng.randint(0, video.shape[0] - self.clip_len + 1)
                     if self.train else 0)
            clip = np.asarray(video[start:start + self.clip_len])
            if clip.ndim == 3:
                clip = clip[..., None]
            if clip.shape[-1] < c:
                clip = np.repeat(clip, c, axis=-1)[..., :c]
            clips.append(clip[..., :c])
        batch = jnp.asarray(np.stack(clips))
        self._key, sub = jax.random.split(self._key)
        return _transform_batch(sub, batch, self.dataset, self.size,
                                self.train and self.augment)


def parse_video_corpus(cfg) -> Dict:
    """parse_datasets branch for the Vid-ODE external datasets."""
    clip_len = int(cfg.get("window_size", 0)) or int(
        cfg.train_seq if cfg.get("phase", "train") == "train"
        else cfg.test_seq)
    root = pathlib.Path(str(cfg.get("data_dir", "datasets")))
    # accept either .../<dataset>/ or a parent datasets/ dir
    if not (root / "train").exists() and (root / cfg.dataset / "train").exists():
        root = root / cfg.dataset
    test_len = (int(cfg.get("test_seq", clip_len))
                if cfg.get("phase") == "test" else clip_len)
    mk = lambda train: VideoCorpus(
        root, cfg.dataset, batch_size=cfg.batch_size,
        clip_len=clip_len if train else test_len,
        is_train=train, resolution=int(cfg.get("resolution", 64)),
        seed=cfg.get("seed", 0))
    train_loader, test_loader = mk(True), mk(False)
    return {
        "train_dataloader": train_loader,
        "test_dataloader": test_loader,
        "n_train_batches": len(train_loader),
        "n_test_batches": len(test_loader),
        "frozen": True,
    }
