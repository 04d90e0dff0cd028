"""Tensor parallelism over the mesh's "model" axis.

The reference needs only DP (SURVEY.md §2.3), but its heaviest layer — the
DINOHead's weight-normalized prototype matrix, out_dim up to 65536
(dino/main_dino.py:55, vision_transformer.py:257-291) — is embarrassingly
shardable over prototypes: the per-column weight norm is local (norm over
the UNsharded input dim), the logits matmul splits column-wise, and every
softmax/cross-entropy/center reduction over the prototype axis becomes a
psum that XLA inserts automatically once the operands carry shardings.

`shard_dino_state` lays out a DinoTrainState accordingly: prototype weights
(last_layer v (in, out) and g (out,)), their Adam moments (the mu/nu trees
mirror the param tree, so the same path rule applies), and the DINO center
(1, out) shard over "model"; everything else replicates. Because the
training step's inputs carry these shardings and the update preserves tree
structure, the weights STAY sharded across scan steps and epochs — asserted
by tests/test_parallel.py.

`shard_params_tp` (generic column sharding of divisible 2-D kernels) remains
for experiments.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def shard_params_tp(params, mesh: Mesh, axis: str = "model"):
    """device_put params with 2-D kernels column-sharded over `axis` (when
    divisible), everything else replicated."""
    size = mesh.shape[axis]

    def put(x):
        if np.ndim(x) == 2 and x.shape[-1] > 0 and x.shape[-1] % size == 0:
            spec = P(None, axis)
        else:
            spec = P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, params)


def _path_names(path) -> list:
    out = []
    for p in path:
        if hasattr(p, "key"):
            out.append(str(p.key))
        elif hasattr(p, "name"):
            out.append(str(p.name))
        elif hasattr(p, "idx"):
            out.append(str(p.idx))
    return out


def dino_tp_spec(path, leaf, model_size: int, axis: str = "model") -> P:
    """Sharding spec for one leaf of a DinoTrainState (params, moments or
    center) — prototype-dimension leaves shard over `axis`."""
    names = _path_names(path)
    if "last_layer" in names:
        if np.ndim(leaf) == 2 and leaf.shape[-1] % model_size == 0:
            return P(None, axis)  # v: (in, out)
        if np.ndim(leaf) == 1 and leaf.shape[0] % model_size == 0:
            return P(axis)  # g: (out,)
    if names and names[-1] == "center":
        if np.ndim(leaf) == 2 and leaf.shape[-1] % model_size == 0:
            return P(None, axis)
    return P()


def shard_dino_state(mesh: Mesh, state, axis: str = "model", out_dim: Optional[int] = None):
    """Lay out a DinoTrainState on the mesh: TP for the prototype layer when
    a `model` axis (size > 1, dividing out_dim) exists, replication
    otherwise. Multi-process safe (every process passes the same host
    values)."""
    model_size = mesh.shape[axis] if axis in mesh.axis_names else 1
    if model_size <= 1 or (out_dim is not None and out_dim % model_size != 0):
        from cerebra.parallel.dataflow import put_replicated

        return put_replicated(mesh, state)

    from cerebra.parallel.dataflow import put_global

    def put(path, leaf):
        spec = dino_tp_spec(path, leaf, model_size, axis)
        return put_global(mesh, np.asarray(leaf), spec)

    return jax.tree_util.tree_map_with_path(put, state)
