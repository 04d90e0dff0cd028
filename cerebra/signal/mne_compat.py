"""MNE helper parity (utils/MNE_Utils.py:5-60) — RawArray creation, band
filtering, and montage assignment.

MNE is an optional host-side analysis dependency (not installed in the
zero-egress build environment): when present, these helpers return real
`mne.io.Raw` objects exactly like the reference; when absent, the
data-shaping parts fall back to pure numpy + cerebra.signal.filters so the
analysis pipeline stays runnable (a RawBundle with the same array/info
content), and montage assignment reports unavailable.

The Welch band-power half of MNE_Utils (`checkFrequencies`, :63-95) lives in
cerebra.signal.psd (batched JAX Welch).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence

import numpy as np


def _mne():
    try:
        import mne

        return mne
    except ImportError:
        return None


@dataclasses.dataclass
class RawBundle:
    """Numpy fallback for mne.io.Raw: continuous (C, N·T) data + info."""

    data: np.ndarray  # (C, total_samples)
    channel_names: List[str]
    channel_types: List[str]
    sampling_freq: float

    def get_data(self) -> np.ndarray:
        return self.data


def create_info(channel_names: Sequence[str], channel_types: Sequence[str],
                sampling_freq: float = 1000.0):
    """`createInfoForDataset` (utils/MNE_Utils.py:9-10)."""
    mne = _mne()
    if mne is not None:
        return mne.create_info(ch_names=list(channel_names),
                               ch_types=list(channel_types), sfreq=sampling_freq)
    return {"ch_names": list(channel_names), "ch_types": list(channel_types),
            "sfreq": sampling_freq}


def create_raw_data(eeg_features: np.ndarray, channel_names: Sequence[str],
                    channel_types: Sequence[str], sampling_freq: float = 1000.0):
    """`create_RAW_data` (utils/MNE_Utils.py:12-29): stack per-sample (T, C)
    epochs into one continuous channels×time recording.

    Returns mne.io.Raw (mne installed) or a RawBundle with identical data.
    """
    eeg_features = np.asarray(eeg_features)
    n, T, C = eeg_features.shape
    continuous = np.concatenate([eeg_features[i].T for i in range(n)], axis=1)  # (C, n·T)
    mne = _mne()
    if mne is not None:
        info = create_info(channel_names, channel_types, sampling_freq)
        raws = [mne.io.RawArray(eeg_features[i].T, info, verbose="ERROR")
                for i in range(n)]
        return mne.io.concatenate_raws(raws)
    return RawBundle(continuous, list(channel_names), list(channel_types),
                     sampling_freq)


def filter_frequency_bands(raw, l_freq: float, h_freq: float,
                           sampling_freq: float = 1000.0):
    """`filter_frequency_bands` (utils/MNE_Utils.py:33-60): band-pass the
    recording and try every built-in montage until one fits the channel set.

    Fallback path filters with cerebra's own zero-phase band-pass (scipy-exact
    filtfilt) and returns a RawBundle (montage assignment needs mne).
    """
    mne = _mne()
    if mne is not None and not isinstance(raw, RawBundle):
        from mne.filter import filter_data

        filtered = filter_data(raw.get_data(), sampling_freq, l_freq=l_freq,
                               h_freq=h_freq, verbose="ERROR")
        out = mne.io.RawArray(filtered, raw.info, verbose="ERROR")
        filt_raw = out.copy().filter(l_freq=l_freq, h_freq=h_freq, verbose="ERROR")
        for name in mne.channels.get_builtin_montages():
            montage = mne.channels.make_standard_montage(kind=name)
            try:
                filt_raw.set_montage(montage)
                break
            except Exception:
                continue
        return filt_raw

    import jax.numpy as jnp

    from cerebra.signal.filters import design_bandpass, filtfilt

    spec = design_bandpass(l_freq, h_freq, fs=sampling_freq, order=4)
    # the reference band-passes TWICE (filter_data at MNE_Utils.py:44, then
    # .filter() again on the copy at :49) — a quirk, but behavior-defining;
    # both our mne path and this fallback reproduce it so the two paths agree
    filtered = jnp.asarray(raw.get_data(), jnp.float32)
    for _ in range(2):
        filtered = filtfilt(spec, filtered)
    return RawBundle(np.asarray(filtered), list(raw.channel_names),
                     list(raw.channel_types), raw.sampling_freq)


def montage_available() -> bool:
    return _mne() is not None
