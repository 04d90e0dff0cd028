"""Corpus-level model transforms — pure versions of the reference's in-place
dataset mutations (SURVEY.md §2.2 "Dataset in-place transforms").

Each reference `transformEEGData*` method mutated `subsetData[i]["eeg"]` in a
Python loop; here each is one batched forward over the dense corpus arrays
returning a NEW corpus / feature bank:

| reference (utils/PerilsEEGDataset.py)   | here                      |
|------------------------------------------|---------------------------|
| transformEEGDataLSTM / ...ByList (:308) | lstm_features             |
| transformEEGData (ResNet→EEG, :344)     | image_regressor_to_eeg    |
| transformEEGDataAE (:377)               | autoencoder_reconstruct   |
| transformEEGDataDino (:410)             | dino_features             |
| transformEEGDataToChannelWiseNorm (:464)| corpus.with_eeg(channel_wise_norm) |
| transformToEEGNoisyData (:149)          | noise_replace             |
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from cerebra.data.corpus import EEGCorpus


def _batched(fn: Callable, x: jax.Array, batch_size: int) -> np.ndarray:
    outs = []
    for start in range(0, x.shape[0], batch_size):
        outs.append(np.asarray(fn(x[start : start + batch_size])))
    return np.concatenate(outs, axis=0)


def lstm_features(
    corpus: EEGCorpus, model, params, batch_size: int = 256, features_only: bool = False
) -> np.ndarray:
    """(N, F) LSTM feature bank (transformEEGDataLSTMByList, corpus-indexed
    labels — the reference's batch-local label bug §7.5 fixed)."""
    fn = jax.jit(
        lambda x: model.apply({"params": params}, x, features_only=features_only)
    )

    def run(x):
        out = fn(x)
        return out[0] if isinstance(out, tuple) else out

    return _batched(run, jnp.asarray(corpus.eeg), batch_size)


def autoencoder_reconstruct(corpus: EEGCorpus, model, variables, batch_size: int = 256) -> EEGCorpus:
    """Replace corpus EEG with its AE reconstruction (transformEEGDataAE)."""
    def run(x):
        out = model.apply(variables, x)
        dec = out[1] if isinstance(out, tuple) else out
        return dec.reshape(x.shape)

    fn = jax.jit(run)
    new_eeg = _batched(fn, jnp.asarray(corpus.eeg), batch_size)
    return corpus.with_eeg(new_eeg)


def image_regressor_to_eeg(
    corpus: EEGCorpus, image_features: np.ndarray, regressor, params, batch_size: int = 256
) -> EEGCorpus:
    """Image features → regressed pseudo-EEG replacing the corpus EEG
    (transformEEGData with CustomModel/ResnetFeatureRegressor)."""
    T, C = corpus.n_samples, corpus.n_channels
    fn = jax.jit(lambda f: regressor.apply({"params": params}, f))
    out = _batched(fn, jnp.asarray(image_features), batch_size)
    return corpus.with_eeg(out.reshape(corpus.n, T, C))


def dino_features(
    corpus: EEGCorpus, dino_model, key: Optional[jax.Array] = None, batch_size: int = 64
) -> np.ndarray:
    """(N, F) DINO features of tiled EEG-images (transformEEGDataDino
    pass_eeg=True, keep_features_flat=True)."""
    key = jax.random.key(0) if key is None else key
    feats = []
    eeg = jnp.asarray(corpus.eeg)
    for start in range(0, corpus.n, batch_size):
        key, sub = jax.random.split(key)
        feats.append(np.asarray(dino_model.features_from_eeg(sub, eeg[start : start + batch_size])))
    return np.concatenate(feats, axis=0)


def noise_replace(corpus: EEGCorpus, key: jax.Array) -> EEGCorpus:
    """Null-hypothesis corpus: EEG replaced by synthetic noise
    (transformToEEGNoisyData)."""
    from cerebra.data.synthetic import synthetic_eeg_noise

    noise = synthetic_eeg_noise(
        key, corpus.n, corpus.n_channels, corpus.n_samples
    )  # (N, C, T)
    return corpus.with_eeg(np.asarray(jnp.swapaxes(noise, 1, 2)))
