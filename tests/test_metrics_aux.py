"""Tests for aux metrics (accuracy/PCA/mAP/multi_scale), Welch band power,
Gaussian-noise image generator."""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy import signal as sps

from cerebra.data.gauss_noise import GaussNoiseGenerator
from cerebra.eval.metrics import PCA, accuracy, compute_ap, compute_map, multi_scale
from cerebra.signal.psd import EEG_BANDS, band_powers, welch_psd


def test_accuracy_topk():
    logits = jnp.asarray(np.array([[0.1, 0.9, 0.0], [0.8, 0.1, 0.1], [0.2, 0.3, 0.5]]))
    target = jnp.asarray(np.array([1, 1, 2]))
    top1, top2 = accuracy(logits, target, topk=(1, 2))
    assert abs(top1 - 66.66666) < 1e-3
    assert abs(top2 - 100.0) < 1e-6


def test_pca_whitening(rng):
    x = rng.normal(size=(200, 8)) @ np.diag([5, 3, 2, 1, 1, 0.5, 0.2, 0.1])
    p = PCA(dim=4, whit=0.5).fit(x)
    y = p.apply(x)
    assert y.shape == (200, 4)
    # power-whitening with whit=0.5 → unit variance components
    np.testing.assert_allclose(y.std(axis=0, ddof=1), 1.0, rtol=0.2)


def test_compute_ap_perfect():
    assert compute_ap(np.array([0, 1, 2]), 3) == pytest.approx(1.0)
    assert compute_ap(np.array([1]), 1) < 1.0


def test_compute_map():
    # 2 queries over a db of 4; ranks: column per query
    ranks = np.array([[0, 2], [1, 0], [2, 1], [3, 3]])
    gnd = [{"ok": [0, 1], "junk": []}, {"ok": [3], "junk": []}]
    m, aps, _, _ = compute_map(ranks, gnd, kappas=[1])
    assert 0 < m <= 1.0 and len(aps) == 2


def test_multi_scale():
    feats_calls = []

    def model_fn(x):
        feats_calls.append(x.shape)
        return jnp.ones((x.shape[0], 4))

    v = multi_scale(jnp.zeros((2, 16, 16, 3)), model_fn)
    assert len(feats_calls) == 3
    assert feats_calls[1] == (2, 11, 11, 3)  # 16/√2
    np.testing.assert_allclose(float(jnp.linalg.norm(v)), 1.0, rtol=1e-5)


def test_welch_matches_scipy(rng):
    fs = 256.0
    x = rng.normal(size=(3, 1024)).astype(np.float32)
    freqs, psd = welch_psd(jnp.asarray(x), fs, nperseg=256)
    f_want, p_want = sps.welch(x, fs=fs, nperseg=256)
    np.testing.assert_allclose(freqs, f_want)
    # tight: the periodic Hann window makes this true scipy parity (the old
    # symmetric np.hanning needed rtol 2e-2 to mask a ~1% systematic bias)
    np.testing.assert_allclose(np.asarray(psd), p_want, rtol=2e-4, atol=1e-8)


def test_welch_short_signal_shrinks_nperseg(rng):
    """scipy shrinks nperseg to T when the signal is shorter (with a
    UserWarning); the jnp gather would otherwise clamp out-of-bounds reads
    and return a finite-but-wrong PSD."""
    fs = 256.0
    x = rng.normal(size=(2, 100)).astype(np.float32)
    freqs, psd = welch_psd(jnp.asarray(x), fs, nperseg=256)
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore", UserWarning)
        f_want, p_want = sps.welch(x, fs=fs, nperseg=256)
    np.testing.assert_allclose(freqs, f_want)
    np.testing.assert_allclose(np.asarray(psd), p_want, rtol=2e-4, atol=1e-8)


def test_band_powers_alpha_peak():
    fs, t = 256.0, np.arange(2048) / 256.0
    x = np.sin(2 * np.pi * 10.0 * t)[None, :]  # 10 Hz → alpha band
    powers = band_powers(jnp.asarray(x.astype(np.float32)), fs)
    assert set(powers.keys()) == set(EEG_BANDS.keys())
    alpha = float(powers["alpha"][0])
    for name in ("delta", "theta", "beta", "gamma"):
        assert alpha > 10 * float(powers[name][0])


def test_gauss_noise_images(rng):
    imgs = rng.normal(0.5, 0.1, size=(10, 8, 8, 3))
    gen = GaussNoiseGenerator(rank=8).fit(imgs)
    out = gen.sample(rng, shape=(8, 8, 3))
    assert out.shape == (8, 8, 3) and out.dtype == np.uint8
    assert out.min() == 0 and out.max() == 255  # min-max normalized
