"""Device-resident sharded corpora + shard-local batch construction.

This is the TPU-native replacement for the reference's multi-process input
path — DDP + DistributedSampler + per-batch host→device copies
(utils/utils.py:467-503; LstmDistillation.py:406-414;
EEG-BarlowNetworks/train.py:128). Design:

- `shard_corpus` wrap-pads an (N, ...) corpus to the data-axis size (the
  same sample-replication DistributedSampler uses to reach its divisible
  `total_size`) and lays it out as (n_data, n_local, ...) with the leading
  axis sharded over the mesh — every device owns a static shard in HBM.
- `local_epoch_indices` gives every device an independent per-epoch
  permutation of ITS OWN shard. Shard assignment is fixed across epochs
  (samples never migrate between devices/hosts — the deliberate TPU design;
  DistributedSampler reshuffles globally, but with the same per-step
  gradient estimator: a uniformly sampled global batch of B = n_data·B_local
  windows), and within-shard order reshuffles every epoch. When an epoch
  needs more draws than the shard holds, the permutation wraps (duplicating
  a few samples, never dropping any).
- `make_local_gather` turns a (n_data, B_local) index step into the global
  sharded batch with a `shard_map` gather that is collective-free by
  construction: device d only ever indexes device d's shard.

Together these let a MESHED epoch run as one `lax.scan` dispatch (the same
shape as the single-chip path in cerebra.train.recipes) instead of paying
host slicing + device_put per step.

Multi-process: every process holds the full host corpus (exactly like every
DDP rank loads the full .pth) and contributes only the shards its
addressable devices own — `jax.make_array_from_process_local_data` on 1-D
data meshes, `jax.make_array_from_callback` for general (e.g. data×model)
meshes.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _corpus_spec(ndim: int, axis: str) -> P:
    return P(axis, *([None] * (ndim - 1)))


def put_global(mesh: Mesh, arr: np.ndarray, spec: P) -> jax.Array:
    """Host array → global device array with `spec`, correct under any
    process count. Every process must pass the same (deterministic) `arr`;
    each materializes only its addressable shards."""
    sharding = NamedSharding(mesh, spec)
    if jax.process_count() == 1:
        return jax.device_put(arr, sharding)
    return jax.make_array_from_callback(arr.shape, sharding, lambda idx: arr[idx])


def put_replicated(mesh: Mesh, tree):
    """Replicate a pytree over the mesh (params/opt state), multi-process safe."""
    if jax.process_count() == 1:
        return jax.device_put(tree, NamedSharding(mesh, P()))
    return jax.tree.map(
        lambda a: jax.make_array_from_callback(
            np.shape(a), NamedSharding(mesh, P()), lambda idx: np.asarray(a)[idx]
        ),
        tree,
    )


def shard_corpus(
    mesh: Mesh, arr: np.ndarray, axis: str = "data"
) -> Tuple[jax.Array, int]:
    """(N, ...) host corpus → ((n_data, n_local, ...) sharded array, n_local).

    N is wrap-padded to n_data·n_local (n_local = ceil(N/n_data)); the
    padding duplicates leading samples, the DistributedSampler `total_size`
    convention (no sample is ever dropped).
    """
    n_data = mesh.shape[axis]
    N = arr.shape[0]
    n_local = -(-N // n_data)
    total = n_data * n_local
    if total != N:
        # CYCLIC wrap (np.resize semantics): a single arr[:pad] slice under-
        # fills whenever pad > N (tiny corpus on a wide mesh) and the
        # reshape below would crash; DistributedSampler repeats indices
        # cyclically in exactly this case
        reps = np.concatenate([arr] * (-(-(total - N) // max(N, 1)) + 1), axis=0)
        arr = np.concatenate([arr, reps[: total - N]], axis=0)[:total]
    blocked = np.ascontiguousarray(arr.reshape((n_data, n_local) + arr.shape[1:]))
    spec = _corpus_spec(blocked.ndim, axis)
    sharding = NamedSharding(mesh, spec)
    if jax.process_count() == 1:
        return jax.device_put(blocked, sharding), n_local
    if mesh.devices.ndim == 1:
        # canonical multi-host ingest: this process contributes its devices'
        # row-block — valid for make_array_from_process_local_data ONLY when
        # that block is contiguous and ascending in mesh order (a permuted
        # device→process layout would silently hand wrong shards to devices;
        # ADVICE round 3). Otherwise fall through to the general callback
        # path, which indexes the global array per device and is
        # layout-agnostic.
        rows = [
            i
            for i, d in enumerate(mesh.devices.flat)
            if d.process_index == jax.process_index()
        ]
        if rows and rows == list(range(rows[0], rows[0] + len(rows))):
            local = blocked[rows]
            return (
                jax.make_array_from_process_local_data(
                    sharding, local, global_shape=blocked.shape
                ),
                n_local,
            )
    return (
        jax.make_array_from_callback(blocked.shape, sharding, lambda i: blocked[i]),
        n_local,
    )


def local_epoch_indices(
    n_local: int,
    n_data: int,
    batch_local: int,
    n_steps: int,
    seed,
    epoch: int,
) -> np.ndarray:
    """(n_steps, n_data, batch_local) int32 — per-device draws for one epoch.

    Each device row is an independent permutation of [0, n_local), truncated
    (reference drop-tail recipes) or cyclically extended (no-drop recipes)
    to n_steps·batch_local. Deterministic in (seed, epoch) and independent
    of process count, so any process layout trains identically.
    """
    rng = np.random.default_rng((int(seed), int(epoch), 17))
    need = n_steps * batch_local
    out = np.empty((n_data, need), np.int32)
    for d in range(n_data):
        perm = rng.permutation(n_local).astype(np.int32)
        out[d] = np.resize(perm, need)
    return np.ascontiguousarray(out.reshape(n_data, n_steps, batch_local).transpose(1, 0, 2))


def index_spec(axis: str = "data") -> P:
    """Spec of one epoch's index tensor (n_steps, n_data, batch_local)."""
    return P(None, axis, None)


def make_local_gather(mesh: Mesh, axis: str = "data"):
    """gather(corpus (n_data, n_local, ...), idx (n_data, B_local)) →
    (n_data·B_local, ...) batch sharded over `axis`.

    shard_map keeps the gather inside each shard — no collective is ever
    generated, unlike a plain global gather on a sharded operand where the
    SPMD partitioner may all-gather the corpus.
    """

    def gather(corpus: jax.Array, idx: jax.Array) -> jax.Array:
        c_spec = _corpus_spec(corpus.ndim, axis)
        o_spec = _corpus_spec(corpus.ndim - 1, axis)

        def local(c, i):  # c: (1, n_local, ...), i: (1, B_local)
            return c[0, i[0]][None]

        out = jax.shard_map(
            local, mesh=mesh, in_specs=(c_spec, P(axis, None)), out_specs=c_spec
        )(corpus, idx)
        flat = out.reshape((-1,) + out.shape[2:])
        return jax.lax.with_sharding_constraint(
            flat, NamedSharding(mesh, o_spec)
        )

    return gather
