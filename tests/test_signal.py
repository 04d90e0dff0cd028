"""Parity tests: JAX signal kernels vs scipy/numpy golden values
(SURVEY.md §4 test strategy — filters vs scipy filtfilt, norms vs torch ddof)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
from scipy import signal as sps

from cerebra.signal import (
    channel_wise_norm,
    design_bandpass,
    design_notch,
    filtfilt,
    filtfilt_fft,
    lfilter,
    melspectrogram,
    mel_filterbank,
    multicrop_views,
    random_channel_norm_view,
    three_view_augment,
    time_window,
    z2_score_norm,
)
from cerebra.signal.filters import zero_phase_response
from cerebra.signal.spectro import stft_magnitude


def _sig(rng, shape=(3, 5, 400)):
    return rng.normal(size=shape).astype(np.float32)


def test_lfilter_matches_scipy(rng):
    spec = design_bandpass(1.0, 50.0, fs=1000.0, order=4)
    x = _sig(rng)
    got = np.asarray(lfilter(spec, jnp.asarray(x)))
    want = sps.sosfilt(spec.sos, x.astype(np.float64), axis=-1)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)


def test_filtfilt_matches_scipy(rng):
    spec = design_bandpass(1.0, 50.0, fs=1000.0, order=4)
    x = _sig(rng, (2, 3, 300))
    got = np.asarray(filtfilt(spec, jnp.asarray(x)))
    want = sps.sosfiltfilt(spec.sos, x.astype(np.float64), axis=-1)
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-4)


def test_filtfilt_matches_scipy_float64(rng):
    """Exactness check under x64 — the float32 test above allows fp slack."""

    spec = design_bandpass(1.0, 50.0, fs=1000.0, order=4)
    x = rng.normal(size=(2, 256)).astype(np.float64)
    with jax.enable_x64():
        got = np.asarray(filtfilt(spec, jnp.asarray(x, dtype=jnp.float64)))
    want = sps.sosfiltfilt(spec.sos, x, axis=-1)
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-10)


def test_notch_kills_line_frequency():
    fs, t = 1000.0, np.arange(1000) / 1000.0
    x = np.sin(2 * np.pi * 60.0 * t).astype(np.float32)[None, :]
    spec = design_notch(60.0, fs)
    # scan path: exact scipy parity (scipy itself leaves a Q=30 transient)
    y = np.asarray(filtfilt(spec, jnp.asarray(x)))
    want = sps.sosfiltfilt(spec.sos, x.astype(np.float64), axis=-1)
    np.testing.assert_allclose(y, want, rtol=1e-2, atol=1e-3)
    # FFT zero-phase path (circular, exact for a periodic signal): kills the
    # line frequency outright
    yf = np.asarray(filtfilt_fft(spec, jnp.asarray(x), padlen=0))
    assert np.abs(yf).max() < 1e-4


def test_filtfilt_fft_close_to_filtfilt_interior(rng):
    # the ingest band (ConvertToPth.py:106-107); impulse response short
    # enough for the FFT fast path to track the exact scan path
    spec = design_bandpass(14.0, 71.0, fs=1000.0, order=4)
    x = _sig(rng, (4, 512))
    a = np.asarray(filtfilt(spec, jnp.asarray(x)))
    b = np.asarray(filtfilt_fft(spec, jnp.asarray(x)))
    np.testing.assert_allclose(a[:, 64:-64], b[:, 64:-64], rtol=0.05, atol=0.06)


def test_zero_phase_response_precompute(rng):
    spec = design_bandpass(14.0, 71.0, fs=1000.0, order=4)
    x = jnp.asarray(_sig(rng, (4, 512)))
    h2 = zero_phase_response(spec, 512 + 2 * 256)
    np.testing.assert_allclose(
        np.asarray(filtfilt_fft(spec, x, h2=h2)), np.asarray(filtfilt_fft(spec, x)), atol=1e-6
    )


def test_channel_wise_norm_matches_torch_ddof(rng):
    x = _sig(rng, (2, 50, 6))
    got = np.asarray(channel_wise_norm(jnp.asarray(x)))
    t = torch.from_numpy(x)
    want = ((t - t.mean(dim=1, keepdim=True)) / t.std(dim=1, keepdim=True)).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(got.mean(axis=1), 0.0, atol=1e-5)


def test_z2_score(rng):
    x = _sig(rng, (3, 50, 6))
    y = np.asarray(z2_score_norm(jnp.asarray(x)))
    for i in range(3):
        assert abs(y[i].mean()) < 1e-5
        assert abs(y[i].std(ddof=1) - 1.0) < 1e-4


def test_random_channel_norm_view(rng):
    x = jnp.asarray(_sig(rng, (64, 16)))
    y = random_channel_norm_view(jax.random.key(0), x, n_channels=4)
    changed = np.abs(np.asarray(y) - np.asarray(x)).max(axis=0) > 1e-6
    assert 1 <= changed.sum() <= 4  # with-replacement draws may collide


def test_three_view_augment_shapes(rng):
    """Pins the reference's aliasing quirk (PerilsEEGDataset.py:575-587):
    normlizeEEG mutates the aliased tensor in place, so the stack is
    (chnorm, chnorm, z2(chnorm)) — views 0 and 1 identical, view 2 the
    z2-score of the channel-normed data, and NO view equals the raw input."""
    x = jnp.asarray(_sig(rng, (5, 60, 8)))
    v = three_view_augment(jax.random.key(1), x)
    assert v.shape == (5, 3, 60, 8)
    np.testing.assert_allclose(np.asarray(v[:, 0]), np.asarray(v[:, 1]))
    np.testing.assert_allclose(
        np.asarray(v[:, 2]), np.asarray(z2_score_norm(v[:, 1])), rtol=1e-5, atol=1e-5
    )
    assert not np.allclose(np.asarray(v[:, 0]), np.asarray(x))


def test_multicrop_views():
    x = jnp.asarray(np.arange(2 * 500 * 4, dtype=np.float32).reshape(2, 500, 4))
    g, l = multicrop_views(jax.random.key(0), x, 300, 200, 2, 4)
    assert g.shape == (2, 2, 300, 4) and l.shape == (4, 2, 200, 4)
    # each crop is a contiguous time slice
    col = np.asarray(g[0, 0, :, 0])
    np.testing.assert_allclose(np.diff(col), 4.0)


def test_time_window():
    x = jnp.zeros((2, 500, 96))
    assert time_window(x, 20, 480).shape == (2, 460, 96)


def test_mel_filterbank_analytic_golden_linear_regime():
    """librosa-free golden for the Barlow case (sr=256, barlow_utils.py:53-60):
    below 1 kHz the Slaney mel scale is exactly linear (mel = f/(200/3)), so
    the filterbank is evenly spaced triangles with a closed form — computed
    here independently in float64 and compared exactly."""
    sr, n_fft, n_mels = 256.0, 256, 32
    fb = mel_filterbank(sr=sr, n_fft=n_fft, n_mels=n_mels)
    assert fb.shape == (32, 129)
    fft_freqs = np.linspace(0.0, sr / 2, 1 + n_fft // 2)
    centers = np.linspace(0.0, sr / 2, n_mels + 2)  # linear mel ⇒ linear Hz
    width = centers[1] - centers[0]
    want = np.zeros((n_mels, fft_freqs.size))
    for m in range(n_mels):
        tri = 1.0 - np.abs(fft_freqs - centers[m + 1]) / width
        want[m] = np.maximum(0.0, tri) * 2.0 / (centers[m + 2] - centers[m])
    np.testing.assert_allclose(fb, want, rtol=1e-6, atol=1e-9)


def test_mel_filterbank_log_regime_independent_construction():
    """Above 1 kHz the Slaney scale is logarithmic; validate against an
    independent mel-domain-interpolation construction (librosa's documented
    algorithm built a different way) plus the Slaney-normalization invariant
    (each filter integrates to ~1 over Hz)."""
    sr, n_fft, n_mels = 8192.0, 2048, 40
    fb = mel_filterbank(sr=sr, n_fft=n_fft, n_mels=n_mels).astype(np.float64)
    fft_freqs = np.linspace(0.0, sr / 2, 1 + n_fft // 2)

    def hz_to_mel(f):
        f = np.asarray(f, dtype=np.float64)
        lin = f / (200.0 / 3)
        brk = 1000.0 / (200.0 / 3)
        log = brk + np.log(np.maximum(f, 1e-12) / 1000.0) / (np.log(6.4) / 27.0)
        return np.where(f >= 1000.0, log, lin)

    def mel_to_hz(m):
        m = np.asarray(m, dtype=np.float64)
        brk = 1000.0 / (200.0 / 3)
        lin = m * (200.0 / 3)
        log = 1000.0 * np.exp((np.log(6.4) / 27.0) * (m - brk))
        return np.where(m >= brk, log, lin)

    mel_pts = mel_to_hz(np.linspace(hz_to_mel(0.0), hz_to_mel(sr / 2), n_mels + 2))
    want = np.zeros((n_mels, fft_freqs.size))
    for m in range(n_mels):
        lo, c, hi = mel_pts[m], mel_pts[m + 1], mel_pts[m + 2]
        up = (fft_freqs - lo) / (c - lo)
        down = (hi - fft_freqs) / (hi - c)
        want[m] = np.maximum(0.0, np.minimum(up, down)) * 2.0 / (hi - lo)
    np.testing.assert_allclose(fb, want, rtol=1e-6, atol=1e-10)
    # Slaney invariant: each triangle integrates to ≈1 in continuous Hz
    # (trapezoid over the FFT grid is exact except for grid clipping)
    areas = np.trapezoid(want, fft_freqs, axis=1)
    assert (np.abs(areas[5:-1] - 1.0) < 0.05).all()


def test_stft_matches_naive_dft():
    """stft_magnitude vs a naive per-frame numpy DFT (reflect pad + Hann +
    rfft power — librosa stft semantics, pinned without librosa)."""
    rng = np.random.default_rng(11)
    x = rng.normal(size=(257,)).astype(np.float32)
    n_fft, hop = 64, 16
    got = np.asarray(stft_magnitude(jnp.asarray(x), n_fft=n_fft, hop_length=hop))
    pad = n_fft // 2
    xp = np.pad(x.astype(np.float64), (pad, pad), mode="reflect")
    win = np.hanning(n_fft + 1)[:-1]
    n_frames = 1 + (x.size + 2 * pad - n_fft) // hop
    want = np.empty((1 + n_fft // 2, n_frames))
    for t in range(n_frames):
        seg = xp[t * hop : t * hop + n_fft] * win
        want[:, t] = np.abs(np.fft.rfft(seg)) ** 2
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_melspectrogram_shapes_and_energy(rng):
    x = jnp.asarray(rng.normal(size=(2, 3, 512)).astype(np.float32))
    m = melspectrogram(x, sr=256.0, n_mels=32)
    assert m.shape[:3] == (2, 3, 32)
    assert np.all(np.asarray(m) >= -1e-6)


def test_image_augs_smoke(rng):
    """Fast-suite smoke: one aug compile, shape + finiteness only (the full
    property checks compile all eight augs and live in the slow suite)."""
    from cerebra.signal.image_aug import dino_global_crop

    img = jnp.asarray(rng.uniform(0, 1, size=(64, 64, 3)).astype(np.float32))
    g = dino_global_crop(jax.random.key(5), img, 32)
    assert g.shape == (32, 32, 3) and np.isfinite(np.asarray(g)).all()


@pytest.mark.slow  # compiles all 8 aug functions (~10 s); smoke above stays fast
def test_image_augs(rng):
    from cerebra.signal.image_aug import (
        color_jitter,
        dino_global_crop,
        dino_local_crop,
        gaussian_blur,
        normalize,
        random_hflip,
        random_resized_crop,
        solarization,
    )

    img = jnp.asarray(rng.uniform(0, 1, size=(64, 64, 3)).astype(np.float32))
    out = random_resized_crop(jax.random.key(0), img, 32)
    assert out.shape == (32, 32, 3)
    flipped = random_hflip(jax.random.key(1), img, p=1.0)
    np.testing.assert_allclose(np.asarray(flipped), np.asarray(img[:, ::-1, :]))
    jit = color_jitter(jax.random.key(2), img, p=1.0)
    assert jit.shape == img.shape and np.isfinite(np.asarray(jit)).all()
    # blur reduces high-frequency energy (sigma is drawn in [0.1, 2]; assert
    # over several keys so a near-delta draw can't mask the effect)
    hf = lambda x: float(jnp.abs(jnp.diff(x, axis=0)).mean())
    blur_hfs = [hf(gaussian_blur(jax.random.key(k), img, p=1.0)) for k in range(6)]
    assert min(blur_hfs) < 0.8 * hf(img)
    assert all(b <= hf(img) + 1e-6 for b in blur_hfs)
    sol = solarization(jax.random.key(4), img, p=1.0)
    bright = np.asarray(img) >= 0.5
    np.testing.assert_allclose(np.asarray(sol)[bright], 1.0 - np.asarray(img)[bright], atol=1e-6)
    g = dino_global_crop(jax.random.key(5), img, 32)
    l = dino_local_crop(jax.random.key(6), img, 16)
    assert g.shape == (32, 32, 3) and l.shape == (16, 16, 3)
    # normalize: ImageNet stats applied
    n = normalize(img)
    assert abs(float(n.mean())) < 3.0


def test_tile_eeg_to_image(rng):
    from cerebra.signal.windows import tile_eeg_to_image

    eeg = jnp.asarray(rng.normal(size=(8, 30)).astype(np.float32))  # (C, T)
    img = tile_eeg_to_image(jax.random.key(0), eeg, size=16)
    assert img.shape == (3, 16, 16)
    # np.repeat semantics (utils/EEGDataset.py:267): each channel row is
    # repeated ADJACENTLY reps times → rows 0..2 are channel 0, 3..5 ch 1, ...
    np.testing.assert_allclose(np.asarray(img[0, 0]), np.asarray(img[0, 1]))
    np.testing.assert_allclose(np.asarray(img[0, 3]), np.asarray(img[0, 5]))
    assert not np.allclose(np.asarray(img[0, 2]), np.asarray(img[0, 3]))
    # all 3 channels identical
    np.testing.assert_allclose(np.asarray(img[0]), np.asarray(img[2]))
