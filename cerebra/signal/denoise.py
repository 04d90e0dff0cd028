"""Denoising utilities (utils/Utilities.py:411-448).

- `remove_noise`: 4th-order Butterworth 1–50 Hz zero-phase band-pass — the
  reference runs a per-(sample, channel) scipy filtfilt double loop; here it
  is one batched device call.
- `remove_noise_with_ica`: per-sample FastICA denoising — host-side sklearn,
  off the training hot path (exactly how the reference uses it).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from cerebra.signal.filters import design_bandpass, filtfilt


def remove_noise(eeg_data: jax.Array, sampling_rate: float) -> jax.Array:
    """utils/Utilities.py:411-428: Butterworth(4) 1–50 Hz filtfilt over
    (samples, time, channels) — one vmapped scan instead of N·C host calls."""
    spec = design_bandpass(1.0, 50.0, fs=sampling_rate, order=4)
    x = jnp.swapaxes(jnp.asarray(eeg_data), -1, -2)  # (..., C, T)
    y = filtfilt(spec, x)
    return jnp.swapaxes(y, -1, -2)


def remove_noise_with_ica(eeg_data: np.ndarray, n_components: int = 20) -> np.ndarray:
    """utils/Utilities.py:430-448: FastICA(n) fit/inverse per sample.
    eeg_data: (N, T, C) → reconstructed (N, T, C). Host-side tool."""
    from sklearn.decomposition import FastICA

    out = np.empty_like(eeg_data)
    for i in range(eeg_data.shape[0]):
        ica = FastICA(n_components=n_components, whiten="unit-variance", max_iter=500)
        sources = ica.fit_transform(eeg_data[i])
        out[i] = ica.inverse_transform(sources)
    return out
