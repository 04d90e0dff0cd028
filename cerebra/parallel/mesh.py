"""Device mesh construction and batch sharding.

The reference's only parallelism is data parallelism (SURVEY.md §2.3): DDP +
DistributedSampler + implicit grad all-reduce. Here that is a 1-D (or 2-D
data×model, for headroom) mesh; a global batch is sharded over the "data"
axis with NamedSharding and jit inserts the gradient psum automatically when
the loss is a mean over the sharded batch.

Multi-host: `jax.distributed.initialize()` (replacing init_distributed_mode,
utils/utils.py:467-503) is called by the CLIs when JAX_COORDINATOR is set;
inside this module everything is process-count agnostic.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    axes: Sequence[str] = ("data",),
    shape: Optional[Sequence[int]] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """A mesh over all (or given) devices. Default: 1-D "data" mesh — the
    reference's DP world. Pass axes=("data","model") with a shape for
    tensor-parallel experiments."""
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = [len(devices)] + [1] * (len(axes) - 1)
    dev_array = np.asarray(devices).reshape(tuple(shape))
    return Mesh(dev_array, tuple(axes))


def data_sharding(mesh: Mesh, ndim: int = 1, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim over the data axis; replicate the rest —
    the DistributedSampler/DDP equivalent (LstmDistillation.py:406,445)."""
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, axis: str = "data"):
    """device_put every array in the pytree with its batch dim sharded;
    0-d leaves (step counters, epoch scalars) are replicated — a rank-1
    P(axis) spec on a scalar is rejected by device_put."""
    return jax.tree.map(
        lambda x: jax.device_put(
            x,
            data_sharding(mesh, np.ndim(x), axis) if np.ndim(x) else replicated(mesh),
        ),
        batch,
    )
