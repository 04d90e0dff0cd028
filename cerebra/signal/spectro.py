"""Spectrograms: batched STFT + mel filterbank in JAX.

Replaces the per-channel librosa loop of the Barlow recipe
(EEG-BarlowNetworks/barlow_utils.py:53-60: melspectrogram per EEG channel,
sr=256, n_mels=224, stacked ×3 as an image) with one batched rfft over all
(trial, channel) lanes — a single fused kernel instead of C host calls.

Defaults mirror librosa: n_fft=2048, hop=n_fft//4, hann window, centered
(reflect padding), power=2 magnitude, Slaney-style mel filterbank with
Slaney area normalization.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def _hz_to_mel(f: np.ndarray) -> np.ndarray:
    """Slaney mel scale (librosa htk=False)."""
    f = np.asarray(f, dtype=np.float64)
    f_sp = 200.0 / 3
    mels = f / f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(f >= min_log_hz, min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep, mels)


def _mel_to_hz(m: np.ndarray) -> np.ndarray:
    m = np.asarray(m, dtype=np.float64)
    f_sp = 200.0 / 3
    freqs = m * f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(m >= min_log_mel, min_log_hz * np.exp(logstep * (m - min_log_mel)), freqs)


def mel_filterbank(
    sr: float, n_fft: int, n_mels: int, fmin: float = 0.0, fmax: Optional[float] = None
) -> np.ndarray:
    """Slaney-normalized triangular mel filterbank, shape (n_mels, 1+n_fft/2).

    Host-side, float64, computed once (it is a constant weight matrix; the
    mel projection itself is a device matmul that rides the MXU).
    """
    if fmax is None:
        fmax = sr / 2.0
    fft_freqs = np.linspace(0.0, sr / 2.0, 1 + n_fft // 2)
    mel_pts = _mel_to_hz(np.linspace(_hz_to_mel(fmin), _hz_to_mel(fmax), n_mels + 2))
    fdiff = np.diff(mel_pts)
    ramps = mel_pts[:, None] - fft_freqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))
    enorm = 2.0 / (mel_pts[2 : n_mels + 2] - mel_pts[:n_mels])
    return (weights * enorm[:, None]).astype(np.float32)


def stft_magnitude(
    x: jax.Array, n_fft: int = 2048, hop_length: Optional[int] = None, power: float = 2.0
) -> jax.Array:
    """Centered Hann STFT power over the last axis: (..., T) → (..., 1+n_fft/2, frames)."""
    if hop_length is None:
        hop_length = n_fft // 4
    pad = n_fft // 2
    T = x.shape[-1]
    pad_widths = [(0, 0)] * (x.ndim - 1) + [(pad, pad)]
    xp = jnp.pad(x, pad_widths, mode="reflect")
    n_frames = 1 + (T + 2 * pad - n_fft) // hop_length
    idx = jnp.arange(n_fft)[None, :] + hop_length * jnp.arange(n_frames)[:, None]
    frames = xp[..., idx]  # (..., frames, n_fft)
    window = jnp.asarray(np.hanning(n_fft + 1)[:-1], dtype=x.dtype)
    spec = jnp.fft.rfft(frames * window, axis=-1)  # (..., frames, bins)
    mag = jnp.abs(spec) ** power
    return jnp.swapaxes(mag, -1, -2)  # (..., bins, frames)


def melspectrogram(
    x: jax.Array,
    sr: float = 256.0,
    n_fft: int = 2048,
    hop_length: Optional[int] = None,
    n_mels: int = 224,
    fmin: float = 0.0,
    fmax: Optional[float] = None,
    mel_weights: Optional[jax.Array] = None,
) -> jax.Array:
    """Batched mel spectrogram over the last axis: (..., T) → (..., n_mels, frames).

    `convertsignaltomelspectrogram` equivalent (barlow_utils.py:53-60) without
    the per-channel Python loop — pass EEG as (B, C, T) and every channel is
    one lane. Pass precomputed `mel_weights` to keep the call fully jittable.
    """
    if x.shape[-1] < n_fft:
        n_fft = int(2 ** np.floor(np.log2(max(x.shape[-1], 2))))
    S = stft_magnitude(x, n_fft=n_fft, hop_length=hop_length)
    if mel_weights is None:
        mel_weights = jnp.asarray(mel_filterbank(sr, n_fft, n_mels, fmin, fmax), dtype=x.dtype)
    return jnp.einsum("mf,...ft->...mt", mel_weights, S)
