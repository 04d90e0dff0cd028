"""Tensor-parallel parameter sharding rules.

The reference needs only DP (SURVEY.md §2.3), but the mesh is built
("data", "model") so weight matrices can be column-sharded over the model
axis (Megatron-style: shard the output dim of 2-D kernels whose width
divides the axis). XLA inserts the all-gathers/reduce-scatters; on hardware
they ride ICI.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def shard_params_tp(params, mesh: Mesh, axis: str = "model"):
    """device_put params with 2-D kernels column-sharded over `axis` (when
    divisible), everything else replicated."""
    size = mesh.shape[axis]

    def put(x):
        if np.ndim(x) == 2 and x.shape[-1] % size == 0 and x.shape[-1] >= size:
            spec = P(None, axis)
        else:
            spec = P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, params)
