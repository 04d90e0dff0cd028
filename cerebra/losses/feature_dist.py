"""FeatureDistributionLoss family — three distinct reference definitions
sharing one class name (SURVEY.md §2.5)."""

from __future__ import annotations



import jax
import jax.numpy as jnp


def _softmax_ce_with_prob_targets(logits: jax.Array, target_probs: jax.Array) -> jax.Array:
    """torch F.cross_entropy(input, probability-targets):
    mean over batch of -sum(target * log_softmax(input))."""
    return jnp.mean(jnp.sum(-target_probs * jax.nn.log_softmax(logits, axis=-1), axis=-1))


def feature_distribution_loss_v1(
    student_outputs: jax.Array,  # (B, D) regressed features
    teacher_outputs: jax.Array,  # (B, D) frozen teacher features
    labels: jax.Array,  # (B,) int class ids
    pred_label_logits: jax.Array,  # (B, n_classes)
    temperature: jax.Array | float,
    alpha: float = 0.5,
    beta: float = 0.5,
) -> jax.Array:
    """LstmDistillFromDinoV2Train.py:107-140.

    term1 = α·CE(pred_label, label);
    term2 = β·CE(softmax(teacher/T), softmax(student/T)) — replicated exactly
    as written: the teacher's *softmax output* is passed as the CE input
    (re-softmaxed inside) with the student's softmax as probability targets.
    """
    onehot = jax.nn.one_hot(labels, pred_label_logits.shape[-1], dtype=pred_label_logits.dtype)
    term1 = alpha * _softmax_ce_with_prob_targets(pred_label_logits, onehot)
    teacher_soft = jax.nn.softmax(teacher_outputs / temperature, axis=-1)
    student_soft = jax.nn.softmax(student_outputs / temperature, axis=-1)
    term2 = beta * _softmax_ce_with_prob_targets(teacher_soft, student_soft)
    return term1 + term2


def feature_distribution_loss_v2(student_outputs: jax.Array, teacher_outputs: jax.Array) -> jax.Array:
    """LstmDistillation.py:161-172 (mean/std matching):
    0.4·MSE(σ_s,σ_t) + 0.4·MSE(μ_s,μ_t) + 0.2·MSE(s,t).
    Scalar mean/std over ALL elements; std is torch's unbiased (ddof=1)."""
    s_mean, s_std = jnp.mean(student_outputs), jnp.std(student_outputs, ddof=1)
    t_mean, t_std = jnp.mean(teacher_outputs), jnp.std(teacher_outputs, ddof=1)
    mse = jnp.mean((student_outputs - teacher_outputs) ** 2)
    return 0.4 * (s_std - t_std) ** 2 + 0.4 * (s_mean - t_mean) ** 2 + 0.2 * mse


def feature_distribution_loss_v3(
    student_outputs: jax.Array,
    teacher_outputs: jax.Array,
    temperature: jax.Array | float,
) -> jax.Array:
    """LstmDistillFromDinoV2Eval.py:106-146 (soft-target KL · T²):
    sum(p_T · (log p_T − log q_T)) / B · T².

    DELIBERATE robustness deviation: the cited reference computes
    `soft_targets.log()` directly and would itself produce NaN when a
    teacher class underflows to 0 (routine at DINO-scale temps,
    (x−max)/T < −104 in f32) — only the nn.KLDivLoss-based hinton path is
    xlogy-safe in torch. We clip p before the log so an underflowed class
    contributes 0 instead of poisoning the loss; the values match the
    reference everywhere the reference is finite."""
    T = temperature
    p = jax.nn.softmax(teacher_outputs / T, axis=-1)
    log_q = jax.nn.log_softmax(student_outputs / T, axis=-1)
    B = student_outputs.shape[0]
    return jnp.sum(p * (jnp.log(jnp.clip(p, 1e-30)) - log_q)) / B * (T**2)
