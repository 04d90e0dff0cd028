"""Channel-map parsing, bad-channel filtering, and denoise utilities."""

import jax.numpy as jnp
import numpy as np

from cerebra.data.channelmap import (
    BAD_CHANNELS,
    CHANNELMAP_128,
    CHANNELMAP_PERILS_96,
    good_channel_indices,
    read_channel_list,
    read_channel_map,
)
from cerebra.signal.denoise import remove_noise, remove_noise_with_ica


def test_channelmap_128_parses():
    cm = read_channel_map(CHANNELMAP_128)
    assert cm[1] == "Fp1" and cm[3] == "F7"  # channelmap.txt first lines
    assert len(cm) >= 120  # the 128-channel Spampinato rig


def test_perils_channel_list():
    names = read_channel_list(CHANNELMAP_PERILS_96)
    assert names[0] == "A1" and names[-1] == "Status"
    eeg_rows = [n for n in names if not n.startswith("EXG") and n != "Status"]
    assert len(eeg_rows) == 96  # the 96-electrode Perils rig + EXG/Status rows


def test_good_channel_indices():
    names = ["Fp1", "AF3", "O1", "F7"]  # Fp1/O1 are bad, AF3/F7 good
    good = good_channel_indices(names)
    assert good == [1, 3]
    assert "Fp1" in BAD_CHANNELS and "AF3" not in BAD_CHANNELS


def test_remove_noise_is_bandpass(rng):
    fs, T = 1000.0, 1024
    t = np.arange(T) / fs
    # 0.2 Hz drift + 10 Hz signal + 100 Hz noise over (samples, time, channels)
    x = (
        3.0 * np.sin(2 * np.pi * 0.2 * t)
        + np.sin(2 * np.pi * 10.0 * t)
        + 0.8 * np.sin(2 * np.pi * 100.0 * t)
    ).astype(np.float32)
    eeg = np.tile(x[None, :, None], (2, 1, 3))
    y = np.asarray(remove_noise(jnp.asarray(eeg), fs))
    spec_in = np.abs(np.fft.rfft(eeg[0, :, 0]))
    spec_out = np.abs(np.fft.rfft(y[0, 200:-200, 0], n=T))
    freqs = np.fft.rfftfreq(T, 1 / fs)

    def band_power(spec, lo, hi):
        m = (freqs >= lo) & (freqs <= hi)
        return spec[m].max()

    # 10 Hz survives, 0.2 Hz drift and 100 Hz noise are attenuated
    assert band_power(spec_out, 8, 12) > 0.3 * band_power(spec_in, 8, 12)
    assert band_power(spec_out, 0, 0.5) < 0.1 * band_power(spec_in, 0, 0.5)
    assert band_power(spec_out, 95, 105) < 0.2 * band_power(spec_in, 95, 105)


def test_remove_noise_with_ica_roundtrip(rng):
    # full-rank ICA (n_components == channels) reconstructs the input
    x = rng.normal(size=(2, 200, 5)).astype(np.float64)
    y = remove_noise_with_ica(x, n_components=5)
    assert y.shape == x.shape
    # reconstruction error small relative to signal
    assert np.linalg.norm(y - x) / np.linalg.norm(x) < 0.05
