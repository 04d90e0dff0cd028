"""MNE helper parity (utils/MNE_Utils.py:12-60) — numpy fallback path
(mne is not installed in this environment; when it is, the same API returns
real Raw objects)."""

import numpy as np

from cerebra.signal.mne_compat import (
    RawBundle,
    create_info,
    create_raw_data,
    filter_frequency_bands,
)


def test_create_raw_concatenates_epochs():
    rng = np.random.default_rng(0)
    eeg = rng.normal(size=(3, 50, 4)).astype(np.float32)  # (N, T, C)
    names = [f"ch{i}" for i in range(4)]
    raw = create_raw_data(eeg, names, ["eeg"] * 4, sampling_freq=256.0)
    data = raw.get_data()
    assert data.shape == (4, 150)  # channels × concatenated time
    # epoch order preserved: first epoch transposed at the head
    np.testing.assert_allclose(data[:, :50], eeg[0].T, rtol=1e-6)
    np.testing.assert_allclose(data[:, 100:], eeg[2].T, rtol=1e-6)


def test_filter_frequency_bands_passband():
    fs = 256.0
    t = np.arange(1024) / fs
    # 2 Hz (stop) + 10 Hz (pass) + 60 Hz (stop)
    sig = (np.sin(2 * np.pi * 2 * t) + np.sin(2 * np.pi * 10 * t)
           + np.sin(2 * np.pi * 60 * t))
    raw = RawBundle(np.tile(sig, (3, 1)).astype(np.float32),
                    ["a", "b", "c"], ["eeg"] * 3, fs)
    out = filter_frequency_bands(raw, 8.0, 14.0, sampling_freq=fs)
    y = out.get_data()[0][100:-100]  # drop edges
    ref = np.sin(2 * np.pi * 10 * t)[100:-100]
    # the 10 Hz component survives, the others are attenuated
    corr = np.corrcoef(y, ref)[0, 1]
    assert corr > 0.98
    assert y.std() < 0.8  # single-component amplitude, not 3


def test_create_info_fallback_dict():
    info = create_info(["a", "b"], ["eeg", "eeg"], 512.0)
    if isinstance(info, dict):
        assert info["sfreq"] == 512.0 and info["ch_names"] == ["a", "b"]
