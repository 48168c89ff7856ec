"""Tensor-parallel parameter sharding specs.

The reference has no tensor parallelism (SURVEY §2.9: "not required for
parity; keep mesh-ready"). This module keeps the mesh 'model' axis live:
a rule-based PartitionSpec tree shards the output-channel dimension of
large conv/dense kernels over 'model', with everything else replicated —
XLA then inserts the all-gathers/reduce-scatters from the annotations
(the scaling-book recipe: pick a mesh, annotate, let XLA place
collectives).
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ode_rl_tpu.parallel.mesh import MODEL_AXIS


def tp_param_spec(params: Any, mesh: Mesh, min_channels: int = 64):
    """PartitionSpec pytree: conv/dense kernels with an output-channel
    dim divisible by the model-axis size and ≥ min_channels shard that
    dim over 'model'; small tensors replicate."""
    n_model = mesh.shape[MODEL_AXIS]

    def spec_for(path, leaf):
        if leaf.ndim >= 2:
            out_ch = leaf.shape[-1]
            if out_ch >= min_channels and out_ch % n_model == 0:
                return P(*([None] * (leaf.ndim - 1) + [MODEL_AXIS]))
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, params)


def shard_params_tp(params: Any, mesh: Mesh, min_channels: int = 64):
    """Place params with the TP spec over the mesh."""
    specs = tp_param_spec(params, mesh, min_channels)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params, specs)
