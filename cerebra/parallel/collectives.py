"""Named collectives — 1:1 map from the reference's torch.distributed calls
(SURVEY.md §5 "Distributed communication backend") to XLA collectives.

| reference                                         | here            |
|----------------------------------------------------|-----------------|
| dist.all_reduce(center) (dino/main_dino.py:477)    | psum / pmean    |
| dist.all_reduce(c) (EEG-BarlowNetworks/net.py:38)  | psum            |
| dist.all_gather(feats) (PerilsEEGDataset.py:194)   | all_gather      |
| metric sync all_reduce (utils/utils.py:248-251)    | psum            |
| dist.barrier (utils/utils.py:249,502)              | (not needed —   |
|                                                    | SPMD sync is    |
|                                                    | implicit)       |

These are thin wrappers so algorithm code names its communication; all run
inside shard_map/pjit over a Mesh and ride ICI (intra-slice) / DCN
(multi-slice) as XLA chooses.
"""

from __future__ import annotations

import jax


def psum(x, axis_name: str = "data"):
    return jax.lax.psum(x, axis_name)


def pmean(x, axis_name: str = "data"):
    return jax.lax.pmean(x, axis_name)


def all_gather(x, axis_name: str = "data", axis: int = 0, tiled: bool = True):
    """Gather per-replica shards into the full array on every replica —
    the extract_features all_gather (utils/PerilsEEGDataset.py:192-215)."""
    return jax.lax.all_gather(x, axis_name, axis=axis, tiled=tiled)


def axis_size(axis_name: str = "data"):
    """world_size equivalent (utils/utils.py:429-433)."""
    return jax.lax.psum(1, axis_name)
