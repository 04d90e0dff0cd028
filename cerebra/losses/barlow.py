"""Barlow-Twins redundancy-reduction loss (EEG-BarlowNetworks/net.py:33-42).

The cross-correlation matrix c = BN(z1)ᵀ BN(z2) / global_batch is psum'd over
the data axis (replacing torch.distributed.all_reduce(c)), then
on-diag (c_ii − 1)² + λ · off-diag c_ij², λ = 0.0051 (train.py:40).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _batch_norm_nonaffine(
    z: jax.Array, eps: float = 1e-5, axis_name: Optional[str] = None
) -> jax.Array:
    """nn.BatchNorm1d(affine=False) training-mode: per-feature standardization
    across the batch (biased variance, matching torch's normalizer).

    With `axis_name` the statistics are pmean-reduced over the collective
    axis — SyncBatchNorm semantics (EEG-BarlowNetworks/train.py:89): the
    reference standardizes with GLOBAL batch stats, so the shard_map path
    must too or its loss/gradients diverge from the GSPMD meshed recipe."""
    mean = jnp.mean(z, axis=0, keepdims=True)
    sq = jnp.mean(z * z, axis=0, keepdims=True)
    if axis_name is not None:
        mean = jax.lax.pmean(mean, axis_name)
        sq = jax.lax.pmean(sq, axis_name)
    var = sq - mean * mean
    return (z - mean) * jax.lax.rsqrt(var + eps)


def barlow_twins_loss(
    z1: jax.Array,  # (B, D) projector output, view 1 (image branch)
    z2: jax.Array,  # (B, D) projector output, view 2 (EEG branch)
    lambd: float = 0.0051,
    global_batch_size: Optional[int] = None,
    axis_name: Optional[str] = None,
) -> jax.Array:
    if global_batch_size is None:
        global_batch_size = z1.shape[0] * (
            jax.lax.psum(1, axis_name) if axis_name is not None else 1
        )
    c = (
        _batch_norm_nonaffine(z1, axis_name=axis_name).T
        @ _batch_norm_nonaffine(z2, axis_name=axis_name)
    )
    c = c / global_batch_size
    if axis_name is not None:
        c = jax.lax.psum(c, axis_name)
    on_diag = jnp.sum((jnp.diagonal(c) - 1.0) ** 2)
    off_diag = jnp.sum(c**2) - jnp.sum(jnp.diagonal(c) ** 2)
    return on_diag + lambd * off_diag
