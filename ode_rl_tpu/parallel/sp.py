"""Spatial/sequence partitioning (the 'sp' mesh axis).

The reference is single-device everywhere outside FlowNet2's
``nn.DataParallel`` (SURVEY §2.9), so spatial partitioning has no
reference counterpart — it exists because it is the natural TPU scaling
axis once the batch axis saturates: video activations are (B, T, H, W, C)
and the conv towers dominate, so sharding H over a mesh axis splits every
conv's rows across chips while XLA's GSPMD partitioner inserts the halo
exchanges (``collective-permute`` of the kernel-overlap rows) that keep
the convolution math exact. No model code changes — the sharding is pure
annotation, same as the dp/tp axes in ``parallel/mesh.py``.

Use when per-chip HBM cannot hold a full-resolution frame (large H) or
when batch-per-chip has shrunk to 1 and more chips remain — the classic
activation-partitioning regime.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ode_rl_tpu.parallel.mesh import DATA_AXIS

SPACE_AXIS = "space"


def make_sp_mesh(
    n_data: Optional[int] = None,
    n_space: int = 2,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a ('data', 'space') mesh: batch over 'data', frame-height
    over 'space'."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_space
    if n_data * n_space != len(devices):
        raise ValueError(
            f"mesh {n_data}×{n_space} does not cover {len(devices)} devices")
    grid = np.asarray(devices).reshape(n_data, n_space)
    return Mesh(grid, (DATA_AXIS, SPACE_AXIS))


def video_sp_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """(B, T, H, ...) arrays: batch over 'data', H (axis 2) over 'space'."""
    spec = [None] * ndim
    spec[0] = DATA_AXIS
    if ndim >= 4:  # (B, T, H, W[, C]) — only shard a real height axis
        spec[2] = SPACE_AXIS
    return NamedSharding(mesh, P(*spec))


def shard_batch_sp(batch, mesh: Mesh):
    """Place a batch dict on a ('data', 'space') mesh: video tensors shard
    batch over 'data' AND height over 'space'; per-sample vectors (masks,
    labels) shard over 'data' only; shared arrays (timestamps) replicate."""
    batch_size = batch["observed_data"].shape[0]

    def place(x):
        if not (hasattr(x, "ndim") and x.ndim >= 1
                and x.shape[0] == batch_size):
            return jax.device_put(x, NamedSharding(mesh, P()))
        if x.ndim >= 4:
            return jax.device_put(x, video_sp_sharding(mesh, x.ndim))
        return jax.device_put(
            x, NamedSharding(mesh, P(DATA_AXIS, *([None] * (x.ndim - 1)))))

    return jax.tree_util.tree_map(place, batch)
