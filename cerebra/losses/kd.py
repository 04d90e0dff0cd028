"""Knowledge-distillation losses (Hinton-style)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def hinton_kd_loss(
    student_logits: jax.Array,
    labels: jax.Array,
    teacher_logits: jax.Array,
    temperature: float,
    alpha: float,
) -> jax.Array:
    """LstmDistillFromDinoV2TrainSpampinato.py:107-121:
    KLDiv(log_softmax(s/T), softmax(t/T)) · (α·T²) + CE(s, labels) · (1−α).

    torch nn.KLDivLoss() default reduction='mean' averages over ALL elements
    (B·D), which the reference relies on — replicated here.
    """
    T = temperature
    p = jax.nn.softmax(teacher_logits / T, axis=-1)
    log_q = jax.nn.log_softmax(student_logits / T, axis=-1)
    kld = jnp.mean(p * (jnp.log(jnp.clip(p, 1e-30)) - log_q))
    onehot = jax.nn.one_hot(labels, student_logits.shape[-1], dtype=student_logits.dtype)
    ce = jnp.mean(jnp.sum(-onehot * jax.nn.log_softmax(student_logits, axis=-1), axis=-1))
    return kld * (alpha * T * T) + ce * (1.0 - alpha)


def _smooth_l1(x: jax.Array, y: jax.Array, beta: float = 1.0) -> jax.Array:
    d = jnp.abs(x - y)
    return jnp.mean(jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta))


def kl_kd_smooth_l1_loss(
    student_logits: jax.Array,
    teacher_logits: jax.Array,
    temperature: float,
    soft_target_loss_weight: float,
    ce_loss_weight: float,
) -> jax.Array:
    """LSTMDistillRetreival.py:40-70: soft-target KL·T² (sum/B) mixed with
    smooth-L1 on raw features."""
    T = temperature
    p = jax.nn.softmax(teacher_logits / T, axis=-1)
    log_q = jax.nn.log_softmax(student_logits / T, axis=-1)
    B = student_logits.shape[0]
    soft = jnp.sum(p * (jnp.log(jnp.clip(p, 1e-30)) - log_q)) / B * (T**2)
    return soft_target_loss_weight * soft + ce_loss_weight * _smooth_l1(
        student_logits, teacher_logits
    )
