"""Cosine-similarity losses (LSTMDistill.py:28-58, duplicated across 5
reference scripts; collapsed to one canonical module here)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _cosine(a: jax.Array, b: jax.Array, eps: float = 1e-8) -> jax.Array:
    num = jnp.sum(a * b, axis=-1)
    den = jnp.maximum(jnp.linalg.norm(a, axis=-1) * jnp.linalg.norm(b, axis=-1), eps)
    return num / den


def cosine_similarity_loss(
    student_outputs: jax.Array, teacher_outputs: jax.Array, negative_form: bool = False
) -> jax.Array:
    """`1 − mean(cos(s, t))` (CosineSimilarityLoss, LSTMDistill.py:28-35);
    with `negative_form`, `−mean(cos)` (functional variant, :37-58)."""
    c = jnp.mean(_cosine(student_outputs, teacher_outputs))
    return -c if negative_form else 1.0 - c


def cosine_embedding_loss(
    x1: jax.Array, x2: jax.Array, target: jax.Array, margin: float = 0.0
) -> jax.Array:
    """torch `nn.CosineEmbeddingLoss` — selected (then unused) as the criterion
    at LstmDistillFromDinoV2TrainSpampinato.py:385.

    Per pair: `1 − cos(x1, x2)` where `target == 1`,
    `max(0, cos(x1, x2) − margin)` where `target == −1`; mean reduction.
    """
    c = _cosine(x1, x2)
    per_pair = jnp.where(target == 1, 1.0 - c, jnp.maximum(0.0, c - margin))
    return jnp.mean(per_pair)
