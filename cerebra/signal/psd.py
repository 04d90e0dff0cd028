"""Welch PSD + EEG band powers (utils/MNE_Utils.py:63-95 `checkFrequencies`),
batched in JAX instead of per-Raw MNE calls."""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# the reference's band definitions (utils/MNE_Utils.py:69-83)
EEG_BANDS: Dict[str, Tuple[float, float]] = {
    "delta": (0.5, 4.0),
    "theta": (4.0, 7.0),
    "alpha": (8.0, 13.0),
    "beta": (13.0, 30.0),
    "gamma": (30.0, 140.0),
}


def welch_psd(
    x: jax.Array, fs: float, nperseg: int = 256, noverlap: Optional[int] = None
) -> Tuple[np.ndarray, jax.Array]:
    """Welch power spectral density over the last axis.

    x: (..., T) → (freqs (F,), psd (..., F)). Hann window, mean-detrended
    segments, density scaling — scipy.signal.welch parity.
    """
    T = x.shape[-1]
    if nperseg > T:  # scipy.signal.welch shrinks nperseg to the signal
        # length (with a UserWarning) instead of reading out of bounds —
        # jnp's clamped gather would otherwise return a finite-but-wrong PSD.
        nperseg = T
        noverlap = None
    if noverlap is None:
        noverlap = nperseg // 2
    step = nperseg - noverlap
    n_segs = max((T - nperseg) // step + 1, 1)
    idx = jnp.arange(nperseg)[None, :] + step * jnp.arange(n_segs)[:, None]
    segs = x[..., idx]  # (..., n_segs, nperseg)
    segs = segs - jnp.mean(segs, axis=-1, keepdims=True)
    # periodic Hann (scipy get_window('hann', n, fftbins=True)), NOT the
    # symmetric np.hanning(n) — the symmetric window biases the PSD ~1%.
    # scipy's _len_guards returns ones for M <= 1 (hanning(2)[:-1] is [0]).
    win_np = np.ones(1) if nperseg == 1 else np.hanning(nperseg + 1)[:-1]
    window = jnp.asarray(win_np, dtype=x.dtype)
    spec = jnp.fft.rfft(segs * window, axis=-1)
    scale = 1.0 / (fs * jnp.sum(window**2))
    psd = (jnp.abs(spec) ** 2) * scale
    psd = psd.at[..., 1:-1].multiply(2.0)
    freqs = np.fft.rfftfreq(nperseg, 1.0 / fs)
    return freqs, jnp.mean(psd, axis=-2)


def band_powers(
    x: jax.Array, fs: float, nperseg: int = 256, bands: Dict[str, Tuple[float, float]] = EEG_BANDS
) -> Dict[str, jax.Array]:
    """Mean PSD per canonical EEG band (utils/MNE_Utils.py:69-95).
    x: (..., T) → {band: (...,)}."""
    freqs, psd = welch_psd(x, fs, nperseg)
    out = {}
    for name, (lo, hi) in bands.items():
        mask = (freqs >= lo) & (freqs <= hi)
        if not mask.any():
            out[name] = jnp.zeros(psd.shape[:-1], dtype=psd.dtype)
        else:
            out[name] = jnp.mean(psd[..., jnp.asarray(np.nonzero(mask)[0])], axis=-1)
    return out
