"""Flow datasets and .flo I/O.

Capability parity with the reference's flow data stack:
  * Middlebury ``.flo`` read/write
    (/root/reference/flownet2-pytorch/utils/flow_utils.py:7-58 — public
    format: magic 202021.25, int32 width/height, interleaved float32 u,v);
  * the FlyingChairs corpus layout
    (/root/reference/flownet2-pytorch/datasets.py:223-280: sorted ``*.ppm``
    taken as (2i, 2i+1) image pairs with sorted ``*.flo`` targets, frames
    center-cropped to a multiple of 64 for the pyramid);
  * an EPE validation sweep (reference main.py validation loop).

TPU-first: decoding happens on the host (numpy/imageio), but batches ship
as single device arrays and the whole EPE evaluation runs inside one
jitted program per batch.
"""

from __future__ import annotations

import pathlib
from typing import Iterator, Optional, Tuple

import numpy as np

_FLO_MAGIC = 202021.25
IMAGE_EXTS = (".ppm", ".png", ".jpg", ".jpeg")


def read_flo(path) -> np.ndarray:
    """Middlebury .flo → (H, W, 2) float32."""
    with open(path, "rb") as f:
        magic = np.fromfile(f, np.float32, count=1)
        if magic.size == 0 or magic[0] != np.float32(_FLO_MAGIC):
            raise ValueError(f"{path}: bad .flo magic {magic!r}")
        w = int(np.fromfile(f, np.int32, count=1)[0])
        h = int(np.fromfile(f, np.int32, count=1)[0])
        data = np.fromfile(f, np.float32, count=2 * w * h)
        if data.size != 2 * w * h:
            raise ValueError(f"{path}: truncated .flo ({data.size} floats)")
    return data.reshape(h, w, 2)


def write_flo(path, flow: np.ndarray) -> None:
    """(H, W, 2) float32 → Middlebury .flo."""
    flow = np.asarray(flow, np.float32)
    assert flow.ndim == 3 and flow.shape[2] == 2, flow.shape
    h, w = flow.shape[:2]
    with open(path, "wb") as f:
        np.array([_FLO_MAGIC], np.float32).tofile(f)
        np.array([w, h], np.int32).tofile(f)
        flow.tofile(f)  # row-major (h, w, 2) == interleaved u,v


def _read_image(path) -> np.ndarray:
    import imageio.v2 as imageio

    img = np.asarray(imageio.imread(path))
    if img.ndim == 2:
        img = img[..., None].repeat(3, axis=-1)
    return img[..., :3].astype(np.float32) / 255.0


def _center_crop64(img: np.ndarray) -> np.ndarray:
    """Crop to the largest multiple-of-64 size (pyramid alignment,
    reference datasets.py:249-251 render_size)."""
    h, w = img.shape[:2]
    th, tw = (h // 64) * 64, (w // 64) * 64
    y0, x0 = (h - th) // 2, (w - tw) // 2
    return img[y0:y0 + th, x0:x0 + tw]


class FlyingChairsCorpus:
    """FlyingChairs-layout corpus: flat dir of ppm/png pairs + flo files."""

    def __init__(self, root, batch_size: int = 8, is_train: bool = True,
                 train_split: float = 0.9, seed: int = 0,
                 crop_multiple64: bool = True):
        root = pathlib.Path(root)
        images = sorted(p for p in root.iterdir()
                        if p.suffix.lower() in IMAGE_EXTS)
        self.flows = sorted(root.glob("*.flo"))
        if not self.flows:
            raise FileNotFoundError(f"no .flo files under {root}")
        if len(images) != 2 * len(self.flows):
            raise ValueError(
                f"{root}: {len(images)} images for {len(self.flows)} flows "
                "(expected 2 per flow, FlyingChairs layout)")
        self.pairs = [(images[2 * i], images[2 * i + 1])
                      for i in range(len(self.flows))]
        # deterministic train/val split over sample index
        n_train = int(len(self.pairs) * train_split)
        sel = slice(0, n_train) if is_train else slice(n_train, None)
        self.pairs, self.flows = self.pairs[sel], self.flows[sel]
        if not self.pairs:
            raise ValueError(f"{root}: empty {'train' if is_train else 'val'}"
                             " split")
        self.batch_size = batch_size
        self.train = is_train
        self.crop = crop_multiple64
        self._rng = np.random.RandomState(seed)
        self._cursor = 0

    def __len__(self) -> int:
        return max(len(self.pairs) // self.batch_size, 1)

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
        return self

    def _load(self, i: int):
        p1, p2 = self.pairs[i]
        img1, img2 = _read_image(p1), _read_image(p2)
        flow = read_flo(self.flows[i])
        if self.crop:
            img1, img2, flow = map(_center_crop64, (img1, img2, flow))
        return img1, img2, flow

    def __next__(self):
        if self.train:
            idx = self._rng.randint(0, len(self.pairs), self.batch_size)
        else:
            idx = [(self._cursor + i) % len(self.pairs)
                   for i in range(self.batch_size)]
            self._cursor = (self._cursor + self.batch_size) % len(self.pairs)
        i1, i2, fl = zip(*(self._load(i) for i in idx))
        return np.stack(i1), np.stack(i2), np.stack(fl)


def write_synthetic_chairs(out, n_pairs: int = 32, size: int = 64,
                           seed: int = 0) -> pathlib.Path:
    """Materialize a FlyingChairs-layout corpus from the synthetic
    random-warp generator (ppm pairs + .flo), so the disk pipeline is
    exercisable without the real dataset."""
    import imageio.v2 as imageio
    import jax

    from ode_rl_tpu.data.sprites import get_sprite_bank
    from ode_rl_tpu.flow.train import synthetic_flow_batch

    out = pathlib.Path(out)
    out.mkdir(parents=True, exist_ok=True)
    bank = get_sprite_bank()
    key = jax.random.key(seed)
    done = 0
    while done < n_pairs:
        key, sub = jax.random.split(key)
        b = min(8, n_pairs - done)
        img1, img2, flow = synthetic_flow_batch(sub, bank, batch=8,
                                                size=size)
        for i in range(b):
            stem = f"{done + i:05d}"
            u8 = lambda x: (np.asarray(x) * 255).clip(0, 255).astype(np.uint8)
            imageio.imwrite(out / f"{stem}_img1.ppm", u8(img1[i]))
            imageio.imwrite(out / f"{stem}_img2.ppm", u8(img2[i]))
            write_flo(out / f"{stem}_flow.flo", np.asarray(flow[i]))
        done += b
    return out


def validate_epe(model, params, corpus, pair_input: bool = True,
                 single_scale: bool = False,
                 max_batches: Optional[int] = None) -> float:
    """Mean end-point error over the corpus (reference main.py validation
    loop; EPE per flownet2-pytorch losses.py L2 norm). ``pair_input=False``
    for FlowNetC's two-image signature."""
    import jax
    import jax.numpy as jnp

    from ode_rl_tpu.flow.losses import epe

    # params must be a traced ARGUMENT, not a closure capture: jit folds
    # captured arrays into the HLO as literal constants, and FlowNet2's
    # 162.5M fp32 params (~650 MB) blow past the remote-compile transport
    # limit on the tunneled TPU backend (HTTP 413).
    @jax.jit
    def batch_epe(params, img1, img2, flow):
        inputs = ((jnp.concatenate([img1, img2], axis=-1),) if pair_input
                  else (img1, img2))
        flows = model.apply(params, *inputs)
        if single_scale:
            # Stacked FlowNet2: a single full-resolution flow output.
            return epe(flows, flow)
        # Finest pyramid level: 1/4 resolution at 1/4 magnitude for every
        # FlowNet variant here. Guard the convention instead of assuming
        # it — a variant with a different output stride would otherwise
        # silently mis-scale the upsampled flow.
        stride = flow.shape[1] // flows[0].shape[1]
        assert stride == 4, (
            f"validate_epe assumes a stride-4 finest level (×4.0 "
            f"magnitude); this net's finest output is stride {stride} — "
            f"update the scale to match")
        full = jax.image.resize(flows[0], flow.shape, "bilinear") * 4.0
        return epe(full, flow)

    total, n = 0.0, 0
    for b, (img1, img2, flow) in enumerate(corpus):
        if max_batches is not None and b >= max_batches:
            break
        total += float(batch_epe(params, jnp.asarray(img1),
                                 jnp.asarray(img2), jnp.asarray(flow)))
        n += 1
        if n >= len(corpus):
            break
    return total / max(n, 1)
