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


class _ConvParams(nn.Module):
    """Owns an nn.Conv-shaped (kernel, bias) pair WITHOUT applying the conv —
    same names/shapes/initializers as nn.Conv, so the param tree (and every
    torch-import mapping keyed on "Conv_0"/"Conv_1") is identical whichever
    PatchEmbedding path computes with them."""

    kernel_shape: tuple
    features: int

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", nn.linear.default_kernel_init, self.kernel_shape
        )
        bias = self.param("bias", nn.initializers.zeros_init(), (self.features,))
        return kernel, bias


class PatchEmbedding(nn.Module):
    """Note: the reference's pool (1,25)/(1,5) (utils/Conformer.py:78) yields
    191 tokens on (22, 1000) input, which contradicts its own hardcoded
    2440-dim head (= 61 tokens — the original EEG-Conformer pooling
    (1,75)/(1,15)). Pooling is parametrized; defaults reproduce the 61-token
    geometry the head actually expects.

    `fused` (default): the temporal Conv(1→40, (1,25)) and spatial
    Conv(40→40, (C,1)) are consecutive LINEAR maps (BN/ELU only come after,
    utils/Conformer.py:70-77), so they compose exactly into ONE conv with a
    (C, 25) kernel: W[c,k,o] = Σ_m w1[k,m]·w2[c,m,o], bias Σ_m b1[m]·w2 + b2.
    On TPU that's a single K=C·25 im2col matmul instead of a K=25 sliver
    followed by a K=C·40 contraction — 0.39× the FLOPs at an MXU-friendly
    shape (the round-3 conformer sat at 1.3% of peak on exactly these convs).
    Same param tree either way; numerics differ only by float reassociation
    (parity pinned in tests/test_conformer_exp.py)."""

    emb_size: int = 40
    pool_size: int = 75
    pool_stride: int = 15
    dtype: Optional[Any] = None
    fused: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        # x: (B, 1, C, T) channel-first like the reference → NHWC for flax
        x = jnp.transpose(x, (0, 2, 3, 1))  # (B, C, T, 1)
        C = x.shape[1]
        if self.fused:
            w1, b1 = _ConvParams((1, 25, 1, 40), 40, name="Conv_0")()
            w2, b2 = _ConvParams((C, 1, 40, 40), 40, name="Conv_1")()
            dt = self.dtype or x.dtype
            fused_w = jnp.einsum(
                "km,cmo->cko", w1.reshape(25, 40), w2.reshape(C, 40, 40)
            ).astype(dt).reshape(C, 25, 1, 40)
            fused_b = (jnp.einsum("m,cmo->o", b1, w2.reshape(C, 40, 40)) + b2).astype(dt)
            x = jax.lax.conv_general_dilated(
                x.astype(dt), fused_w, window_strides=(1, 1), padding="VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + fused_b  # (B, 1, T-24, 40)
        else:
            x = nn.Conv(40, (1, 25), strides=(1, 1), padding="VALID",
                        dtype=self.dtype, name="Conv_0")(x)
            x = nn.Conv(40, (x.shape[1], 1), strides=(1, 1), padding="VALID",
                        dtype=self.dtype, name="Conv_1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype)(x)
        x = nn.elu(x)
        x = nn.avg_pool(x, (1, self.pool_size), strides=(1, self.pool_stride), padding="VALID")
        x = nn.Dropout(0.5, deterministic=not train)(x)
        # explicit name: the auto-namer would otherwise reuse Conv_0 on the
        # fused path (whose _ConvParams claim Conv_0/Conv_1 by name)
        x = nn.Conv(self.emb_size, (1, 1), dtype=self.dtype, name="Conv_2")(x)  # projection
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
