"""Parallelism: device mesh + named collectives.

Replaces the reference's torch.distributed stack (utils/utils.py:467-503
gloo init, EEG-BarlowNetworks/train.py:71-78 NCCL spawn, DDP wrappers,
DistributedSampler) with a `jax.sharding.Mesh` and XLA collectives over
ICI/DCN. There is no backend object and no process-group boundary: shardings
are annotations, collectives are ops, XLA inserts the transfers.
"""

from cerebra.parallel.mesh import (  # noqa: F401
    make_mesh,
    data_sharding,
    replicated,
    shard_batch,
)
from cerebra.parallel import collectives  # noqa: F401
