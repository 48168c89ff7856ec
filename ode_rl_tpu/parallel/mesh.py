"""Device mesh + sharding helpers — the distributed backend.

The reference has no distributed communication layer at all (its only
multi-device path is single-process ``nn.DataParallel`` in FlowNet2,
/root/reference/flownet2-pytorch/main.py:202,213 — see SURVEY §2.9). This
module is the TPU-native replacement designed in from the start:

  * a ``Mesh`` over the chips with named axes ``('data', 'model')`` —
    video batches shard over ``data`` (the primary axis; ICI all-reduce
    for gradients is inserted by XLA from the sharding annotations),
    ``model`` is reserved for tensor-parallel layouts;
  * helpers to place batches/params with ``NamedSharding`` so jitted
    train steps run SPMD without any explicit collective calls in model
    code;
  * multi-host ready: meshes are built from the global device list, and
    the data layer folds ``jax.process_index()`` into its stream keys.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a ('data', 'model') mesh over the available chips."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    if n_data * n_model != len(devices):
        raise ValueError(
            f"mesh {n_data}×{n_model} does not cover {len(devices)} devices")
    grid = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def data_parallel_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard the leading (batch) axis over 'data', replicate the rest."""
    spec = P(DATA_AXIS, *([None] * (ndim - 1)))
    return NamedSharding(mesh, spec)


def shard_batch(batch, mesh: Mesh):
    """Place a batch dict: arrays with a batch axis shard over 'data';
    shared arrays (timestamps) replicate."""
    batch_size = batch["observed_data"].shape[0]

    def place(x):
        if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == batch_size:
            return jax.device_put(x, data_parallel_sharding(mesh, x.ndim))
        return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree_util.tree_map(place, batch)


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree (params / optimizer state) over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def shard_pytree(tree, mesh: Mesh, specs):
    """Place a pytree with explicit PartitionSpecs (tensor-parallel hooks)."""
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), tree, specs)
