"""EEG Conformer (utils/Conformer.py:68-219): conv patch embedding over
(B, 1, C, T) EEG + transformer encoder + flatten head.

Architecture parity:
- PatchEmbedding (:68-92): Conv(1→40, (1,25)) → Conv(40→40, (C,1)) → BN →
  ELU → AvgPool((1,25), stride (1,5)) → Dropout → 1×1 conv to emb_size →
  tokens (B, N, E);
- TransformerEncoderBlock (:151-173): pre-LN MHA + pre-LN MLP(×4), GELU;
- ClassificationHead (:178-211): FLATTENS all tokens (2440 = 61·40 for the
  22-ch/1000-sample BCI-IV shape) → 1024 → 512 → 384, returning
  (flat_tokens, features) like the reference's forward.

TPU notes: convs/attention map straight onto the MXU; dropout is explicit
(deterministic flag) as usual in flax.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


class PatchEmbedding(nn.Module):
    """Note: the reference's pool (1,25)/(1,5) (utils/Conformer.py:78) yields
    191 tokens on (22, 1000) input, which contradicts its own hardcoded
    2440-dim head (= 61 tokens — the original EEG-Conformer pooling
    (1,75)/(1,15)). Pooling is parametrized; defaults reproduce the 61-token
    geometry the head actually expects."""

    emb_size: int = 40
    pool_size: int = 75
    pool_stride: int = 15
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        # x: (B, 1, C, T) channel-first like the reference → NHWC for flax
        x = jnp.transpose(x, (0, 2, 3, 1))  # (B, C, T, 1)
        x = nn.Conv(40, (1, 25), strides=(1, 1), padding="VALID", dtype=self.dtype)(x)
        x = nn.Conv(40, (x.shape[1], 1), strides=(1, 1), padding="VALID", dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(x)
        x = nn.elu(x)
        x = nn.avg_pool(x, (1, self.pool_size), strides=(1, self.pool_stride), padding="VALID")
        x = nn.Dropout(0.5, deterministic=not train)(x)
        x = nn.Conv(self.emb_size, (1, 1), dtype=self.dtype)(x)  # projection
        B = x.shape[0]
        return x.reshape(B, -1, self.emb_size)  # (B, N, E)


class TransformerEncoderBlock(nn.Module):
    emb_size: int
    num_heads: int = 10
    drop_p: float = 0.5
    forward_expansion: int = 4
    forward_drop_p: float = 0.5
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        E, nh = self.emb_size, self.num_heads
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)
        # explicit attention: the reference scales the logits by
        # √emb_size (utils/Conformer.py:115), NOT the usual √head_dim —
        # with E=40, heads=10 that is a 3.16× colder softmax than flax's
        # MultiHeadDotProductAttention would give. Pinned by the
        # weight-mapped oracle in tests/test_conformer_exp.py.
        B, N, _ = h.shape
        q = nn.Dense(E, dtype=self.dtype, name="queries")(h).reshape(B, N, nh, E // nh)
        k = nn.Dense(E, dtype=self.dtype, name="keys")(h).reshape(B, N, nh, E // nh)
        v = nn.Dense(E, dtype=self.dtype, name="values")(h).reshape(B, N, nh, E // nh)
        energy = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32)
        att = jax.nn.softmax(energy / jnp.sqrt(float(E)), axis=-1).astype(q.dtype)
        att = nn.Dropout(self.drop_p, deterministic=not train)(att)
        h = jnp.einsum("bhqk,bkhd->bqhd", att, v).reshape(B, N, E)
        h = nn.Dense(E, dtype=self.dtype, name="projection")(h)
        x = x + nn.Dropout(self.drop_p, deterministic=not train)(h)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)
        h = nn.Dense(self.forward_expansion * self.emb_size, dtype=self.dtype)(h)
        h = nn.gelu(h, approximate=False)  # the reference's erf GELU (:146-148)
        h = nn.Dropout(self.forward_drop_p, deterministic=not train)(h)
        h = nn.Dense(self.emb_size, dtype=self.dtype)(h)
        return x + nn.Dropout(self.drop_p, deterministic=not train)(h)


class Conformer(nn.Module):
    """Returns (flat_tokens, features) — the reference head's contract
    (utils/Conformer.py:207-211)."""

    emb_size: int = 40
    depth: int = 6
    out_features: int = 384
    pool_size: int = 75
    pool_stride: int = 15
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> Tuple[jax.Array, jax.Array]:
        tokens = PatchEmbedding(
            self.emb_size, self.pool_size, self.pool_stride, dtype=self.dtype
        )(x, train=train)
        for _ in range(self.depth):
            tokens = TransformerEncoderBlock(self.emb_size, dtype=self.dtype)(tokens, train=train)
        flat = tokens.reshape(tokens.shape[0], -1)
        h = nn.Dense(1024, dtype=self.dtype)(flat)
        h = nn.elu(h)
        h = nn.Dropout(0.5, deterministic=not train)(h)
        h = nn.Dense(512, dtype=self.dtype)(h)
        h = nn.elu(h)
        h = nn.Dropout(0.3, deterministic=not train)(h)
        out = nn.Dense(self.out_features, dtype=self.dtype)(h)
        return flat, out
