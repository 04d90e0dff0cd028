"""Normalization ops (pure, batched, jit-friendly).

Replaces the reference's per-sample mutations:
- `normlizeEEG` per-channel norm over time (utils/PerilsEEGDataset.py:454-461)
- z2-score whole-sample norm (utils/PerilsEEGDataset.py:581-584, citing
  arxiv 2210.01081)
- global scalar norm with corpus stats (utils/PerilsEEGDataset.py:570-571)
- the 3-view `data_augment_eeg` stack (utils/PerilsEEGDataset.py:575-587)

Conventions: eeg is (..., T, C) time-major; std uses ddof=1 to match
torch.Tensor.std's unbiased default, which the reference relies on.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _std(x: jax.Array, axis, keepdims=True, ddof: int = 1) -> jax.Array:
    return jnp.std(x, axis=axis, keepdims=keepdims, ddof=ddof)


def channel_wise_norm(eeg: jax.Array, eps: float = 0.0) -> jax.Array:
    """Per-channel (over time) standardization of (..., T, C) EEG —
    vectorized normlizeEEG (utils/PerilsEEGDataset.py:454-461) over all
    channels/trials at once."""
    mean = jnp.mean(eeg, axis=-2, keepdims=True)
    std = _std(eeg, axis=-2)
    return (eeg - mean) / (std + eps)


def z2_score_norm(eeg: jax.Array) -> jax.Array:
    """Whole-sample scalar standardization (utils/PerilsEEGDataset.py:581-584)."""
    reduce_axes = tuple(range(eeg.ndim - 2, eeg.ndim))  # (T, C) of each trial
    mean = jnp.mean(eeg, axis=reduce_axes, keepdims=True)
    std = _std(eeg, axis=reduce_axes)
    return (eeg - mean) / std


def global_scalar_norm(eeg: jax.Array, mean: float, std: float) -> jax.Array:
    """(eeg - mean)/std with corpus scalar stats (utils/PerilsEEGDataset.py:570-571)."""
    return (eeg - mean) / std


def random_channel_norm_view(key: jax.Array, eeg: jax.Array, n_channels: int = 32) -> jax.Array:
    """Normalize a random subset of channels (utils/PerilsEEGDataset.py:576-580).

    The reference draws 32 channel indices WITH replacement and normalizes
    them sequentially; re-normalizing an already-standardized channel is a
    no-op, so this equals normalizing the unique drawn set — implemented as a
    masked select (one fused where, no sequential loop).
    """
    C = eeg.shape[-1]
    draws = jax.random.randint(key, (n_channels,), 0, C)
    mask = jnp.zeros((C,), dtype=bool).at[draws].set(True)
    return jnp.where(mask[None, :], channel_wise_norm(eeg), eeg)


def three_view_augment(key: jax.Array, eeg: jax.Array) -> jax.Array:
    """The `data_augment_eeg` 3-view stack (utils/PerilsEEGDataset.py:575-587).
    eeg: (B, T, C) → (B, 3, T, C).

    Aliasing quirk pinned: the reference's `channel_norm_eeg = eeg` is an
    alias and `normlizeEEG` mutates `EEG[:, ch]` IN PLACE (PerilsEEGDataset
    .py:454-461), so by stack time `eeg` itself is the channel-normed tensor
    and `z2Scoring`'s scalar stats are computed from it — the actual stack
    is (chnorm, chnorm, z2(chnorm)), not (raw, chnorm, z2(raw))."""
    keys = jax.random.split(key, eeg.shape[0])
    ch_view = jax.vmap(random_channel_norm_view)(keys, eeg)
    z2_view = z2_score_norm(ch_view)
    return jnp.stack([ch_view, ch_view, z2_view], axis=1)
