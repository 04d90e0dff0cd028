"""EEG autoencoders (utils/EEGAutoencoder.py, utils/LSTMAutoEncoders.py).

- EEGAutoencoderFC (:25-51): flat FC AE with residual MLP blocks, latent 384;
  forward returns (encoded, decoded).
- EEGAutoencoderConv (:53-83): conv1d 128ch → latent 2048 → deconv; forward
  returns the reconstruction.
- RecurrentAutoencoder (utils/LSTMAutoEncoders.py:4-79): LSTM encoder → last
  hidden (latent) → repeat over seq_len → LSTM decoder; returns
  (encoded, decoded).
- feature_matching_loss: the custom loss (utils/EEGAutoencoder.py:16-23) —
  MSE between the encoder output and target latent features only.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from cerebra.models.lstm import LSTMStack


def feature_matching_loss(encoded: jax.Array, latent_features: jax.Array) -> jax.Array:
    """utils/EEGAutoencoder.py:16-23 (reconstruction term commented out)."""
    return jnp.mean((encoded - latent_features) ** 2)


class _ResidualMLPBlock(nn.Module):
    features: int
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = nn.Dense(self.features, dtype=self.dtype)(x)
        h = nn.relu(h)
        h = nn.Dense(self.features, dtype=self.dtype)(h)
        return x + h


class EEGAutoencoderFC(nn.Module):
    channels: int = 128
    time_freq: int = 480
    latent_dim: int = 384
    num_residual_blocks: int = 2
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> Tuple[jax.Array, jax.Array]:
        flat = x.reshape(x.shape[0], -1)
        h = nn.Dense(1000, dtype=self.dtype)(flat)
        h = nn.relu(h)
        h = nn.Dropout(0.5, deterministic=not train)(h)
        for _ in range(self.num_residual_blocks):
            h = _ResidualMLPBlock(1000, dtype=self.dtype)(h)
        encoded = nn.relu(nn.Dense(self.latent_dim, dtype=self.dtype)(h))
        h = nn.Dense(1000, dtype=self.dtype)(encoded)
        h = nn.relu(h)
        h = nn.Dropout(0.5, deterministic=not train)(h)
        for _ in range(self.num_residual_blocks):
            h = _ResidualMLPBlock(1000, dtype=self.dtype)(h)
        decoded = nn.relu(nn.Dense(self.channels * self.time_freq, dtype=self.dtype)(h))
        return encoded, decoded


class EEGAutoencoderConv(nn.Module):
    """Conv1d AE over (B, C=128, T=480): strided convs 128→64→32→16, flatten
    → latent → mirror deconvs (utils/EEGAutoencoder.py:53-83)."""

    in_channels: int = 128
    latent_dim: int = 2048
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        B, C, T = x.shape
        h = jnp.swapaxes(x, 1, 2)  # (B, T, C) — flax convs are feature-last
        for ch in (64, 32, 16):
            h = nn.Conv(ch, (3,), strides=(2,), padding=((1, 1),), dtype=self.dtype)(h)
            h = nn.relu(h)
        t_enc = h.shape[1]
        flat = h.reshape(B, -1)
        latent = nn.relu(nn.Dense(self.latent_dim, dtype=self.dtype)(flat))
        h = nn.relu(nn.Dense(t_enc * 16, dtype=self.dtype)(latent)).reshape(B, t_enc, 16)
        for ch in (32, 64, self.in_channels):
            h = nn.ConvTranspose(ch, (3,), strides=(2,), padding=((1, 2),), dtype=self.dtype)(h)
            h = nn.relu(h)
        h = h[:, :T, :]
        return jnp.swapaxes(h, 1, 2)  # (B, C, T)


class RecurrentAutoencoder(nn.Module):
    seq_len: int
    n_features: int
    embedding_dim: int = 384
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> Tuple[jax.Array, jax.Array]:
        # encoder: last hidden state of an LSTM over (B, T, C)
        enc_h = LSTMStack(self.embedding_dim, 1, dtype=self.dtype, name="encoder")(x)
        encoded = enc_h[:, -1, :]  # (B, E)
        # decoder: repeat latent over seq_len, run an LSTM back to features
        rep = jnp.repeat(encoded[:, None, :], self.seq_len, axis=1)
        decoded = LSTMStack(self.n_features, 1, dtype=self.dtype, name="decoder")(rep)
        return encoded, decoded
