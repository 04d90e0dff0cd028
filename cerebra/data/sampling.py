"""Splits and batch iteration.

The reference splits corpora with `torch.utils.data.random_split([0.8, 0.2],
generator=torch.Generator().manual_seed(43))` (LstmDistillFromDinoV2Train.py:
289-290) — i.e. a torch `randperm` under a seeded MT generator. Retrieval
parity (BASELINE.md north-star) requires the *exact same indices*, so
`random_split_indices` reproduces that permutation via torch on the host
(IO/bookkeeping only; nothing on the compute path), with a numpy fallback.

Batching is host-side index slicing into the dense corpus arrays — the entire
corpus lives in one block, so a "DataLoader" is just a permutation + reshape.
For multi-chip DP, shard the batch with NamedSharding over the "data" axis
(cerebra.parallel.mesh) instead of torch DistributedSampler
(LstmDistillation.py:406).
"""

from __future__ import annotations

from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np


def random_split_indices(
    n: int, fractions: Sequence[float], seed: int = 43, torch_compat: bool = True
) -> List[np.ndarray]:
    """Split `range(n)` like torch.utils.data.random_split.

    Lengths follow torch's semantics: floor(n * frac) per split, remainders
    distributed round-robin from the first split. With `torch_compat`, the
    permutation is torch.randperm under a manual-seeded generator so both
    the index SETS and their ORDER match the reference's Subset iteration
    bit-for-bit (seed 43 throughout the reference;
    seed 123 in the channel-discovery scripts,
    TestRetrieval_Perils_DiscoverChannels.py:62-63).
    """
    lengths = [int(np.floor(n * f)) for f in fractions]
    for i in range(n - sum(lengths)):
        lengths[i % len(lengths)] += 1
    if torch_compat:
        import torch

        perm = torch.randperm(n, generator=torch.Generator().manual_seed(seed)).numpy()
    else:
        perm = np.random.default_rng(seed).permutation(n)
    out, offset = [], 0
    for length in lengths:
        # keep the randperm slice ORDER (torch Subset iteration order), not
        # just the index set — order-sensitive consumers (gallery layout,
        # per-position artifacts) must match the reference sequence too
        out.append(perm[offset : offset + length].astype(np.int64))
        offset += length
    return out


def batch_iterator(
    n: int,
    batch_size: int,
    *,
    shuffle: bool = True,
    drop_last: bool = False,
    seed: int = 0,
    epoch: int = 0,
) -> Iterator[np.ndarray]:
    """Yield index batches over `range(n)`; reseeded per epoch."""
    if shuffle:
        order = np.random.default_rng((seed, epoch)).permutation(n)
    else:
        order = np.arange(n)
    end = (n // batch_size) * batch_size if drop_last else n
    for start in range(0, end, batch_size):
        yield order[start : min(start + batch_size, n)]


def epoch_batches(
    n: int, batch_size: int, *, seed: int = 0, epoch: int = 0, pad_to_full: bool = True
) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """All batches of an epoch as ONE (num_batches, batch_size) index array.

    TPU-friendly: a whole epoch becomes a single static-shaped array that a
    `lax.scan` / `lax.fori_loop` training epoch can consume without host
    round-trips. When n isn't divisible, the tail batch is padded by wrapping
    (mask returned so metrics can ignore padding).
    """
    order = np.random.default_rng((seed, epoch)).permutation(n)
    num_batches = int(np.ceil(n / batch_size))
    padded = num_batches * batch_size
    mask = None
    if padded != n:
        # wrap as many times as needed (batch_size may exceed n)
        pad = np.resize(order, padded - n)
        mask = np.ones((padded,), dtype=bool)
        mask[n:] = False
        order = np.concatenate([order, pad])
        mask = mask.reshape(num_batches, batch_size)
    return order.reshape(num_batches, batch_size), mask
