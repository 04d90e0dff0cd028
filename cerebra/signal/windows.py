"""Time windowing and temporal multi-crop views.

The reference handles its (short) sequences by *cropping*, never sharding:
- fixed windows `[time_low:time_high)` (utils/PerilsEEGDataset.py:568);
- DINO-style random temporal crops: 2 global × 300 + 4 local × 200 samples
  with end-overflow shifted back into range (LstmDistillation.py:551-569).

TPU-first: crops are `lax.dynamic_slice`s with static sizes inside jit; the
whole multi-crop batch for an iteration is produced by one traced function of
a PRNG key (no Python-side np.random in the step).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def time_window(eeg: jax.Array, time_low: int, time_high: int) -> jax.Array:
    """Static window over the time axis of (..., T, C)."""
    return eeg[..., time_low:time_high, :]


def _crop_starts(key: jax.Array, n: int, t_total: int, length: int) -> jax.Array:
    """Reference boundary rule (LstmDistillation.py:555-560): draw start in
    [0, T), and if start+len overflows, shift back by the overflow."""
    starts = jax.random.randint(key, (n,), 0, t_total)
    overflow = jnp.maximum(starts + length - t_total, 0)
    return starts - overflow


def random_time_crop(key: jax.Array, eeg: jax.Array, length: int) -> jax.Array:
    """One random temporal crop of (B, T, C) → (B, length, C)."""
    start = _crop_starts(key, 1, eeg.shape[-2], length)[0]
    return jax.lax.dynamic_slice_in_dim(eeg, start, length, axis=-2)


def multicrop_views(
    key: jax.Array,
    eeg: jax.Array,
    global_length: int = 300,
    local_length: int = 200,
    n_global: int = 2,
    n_local: int = 4,
) -> Tuple[jax.Array, jax.Array]:
    """DINO temporal multi-crop (LstmDistillation.py:518-569).

    eeg: (B, T, C). Returns (global_views (n_global, B, Lg, C),
    local_views (n_local, B, Ll, C)) — stacked so each group runs as ONE
    batched forward (the MultiCropWrapper same-resolution grouping,
    utils/utils.py:598-633, falls out for free).
    """
    kg, kl = jax.random.split(key)
    T = eeg.shape[-2]
    g_starts = _crop_starts(kg, n_global, T, global_length)
    l_starts = _crop_starts(kl, n_local, T, local_length)

    def slice_at(start, length):
        return jax.lax.dynamic_slice_in_dim(eeg, start, length, axis=-2)

    g = jnp.stack([slice_at(g_starts[i], global_length) for i in range(n_global)])
    l = jnp.stack([slice_at(l_starts[i], local_length) for i in range(n_local)])
    return g, l


def resize_eeg_to_image(eeg: jax.Array, size: int = 224) -> jax.Array:
    """EEG (T, C) → (3, size, size): bilinear resize of the (T, C) plane,
    replicated over 3 channels — the smooth alternative to the reference's
    tiling (see `tile_eeg_to_image` for exact semantics)."""
    img = jax.image.resize(eeg, (size, size), method="bilinear")
    return jnp.broadcast_to(img[None, :, :], (3, size, size))


def tile_eeg_to_image(key: jax.Array, eeg: jax.Array, size: int = 224) -> jax.Array:
    """resizeEEGToImageSize semantics (utils/EEGDataset.py:248-303): each row
    (channel) is repeated ADJACENTLY `size//C+1` times (np.repeat axis=0),
    each column (time sample) likewise (np.repeat axis=1), rows sliced to
    `size`, then a RANDOM size-wide column window is taken and the plane is
    replicated ×3 channels.

    eeg: (C, T) channel-first — the orientation the function's own contract
    assumes ("EEG input_data is assumed (128, 460)", :264). Note the
    reference calls it through two inconsistent paths (the __getitem__ path
    passes (T, C)); we standardize on the documented (C, T) intent.
    Used by the EEG-as-image DINO recipe (dino/main_dino.py:523-531).
    """
    C, T = eeg.shape
    reps_r = size // C + 1
    reps_c = size // T + 1
    rep = jnp.repeat(jnp.repeat(eeg, reps_r, axis=0), reps_c, axis=1)[:size, :]
    width = rep.shape[1]
    start = jax.random.randint(key, (), 0, max(width - size, 1))
    window = jax.lax.dynamic_slice_in_dim(rep, start, size, axis=1)
    return jnp.broadcast_to(window[None], (3, size, size))
