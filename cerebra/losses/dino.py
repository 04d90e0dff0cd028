"""DINO self-distillation losses with explicit center state.

Two reference variants:
- full multi-crop (LstmDistillation.py:101-159, dino/main_dino.py:428-481):
  CE between centered/sharpened teacher softmax and student log-softmax over
  view pairs, skipping same-view terms; teacher-temperature warmup schedule;
  center EMA'd with a cross-replica all_reduce.
- single-pair (LstmDistillFromDinoV2Train.py:45-105): one CE term between a
  frozen teacher's features and the student output, center update kept.

TPU-native: the center is explicit state (a (1, D) array) returned alongside
the loss; the all_reduce becomes `lax.pmean` over `axis_name` when the step
runs under shard_map/pjit with a data axis, and a no-op otherwise.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class DinoCenterState:
    """Explicit replacement for the registered `center` buffer
    (LstmDistillation.py:110)."""

    center: jax.Array  # (1, out_dim)

    @staticmethod
    def create(out_dim: int, dtype=jnp.float32) -> "DinoCenterState":
        return DinoCenterState(center=jnp.zeros((1, out_dim), dtype=dtype))


def teacher_temp_schedule(
    warmup_teacher_temp: float,
    teacher_temp: float,
    warmup_teacher_temp_epochs: int,
    nepochs: int,
) -> np.ndarray:
    """Per-epoch teacher temperature: linear warmup then constant
    (LstmDistillation.py:112-117). Negative warmup values (README.md:19's
    documented `-0.004`) are replicated as-is — it is a schedule, not a
    crash."""
    return np.concatenate(
        [
            np.linspace(warmup_teacher_temp, teacher_temp, warmup_teacher_temp_epochs),
            np.ones(max(nepochs - warmup_teacher_temp_epochs, 0)) * teacher_temp,
        ]
    )


def update_center(
    center: jax.Array,
    teacher_output: jax.Array,
    center_momentum: float = 0.9,
    axis_name: Optional[str] = None,
) -> jax.Array:
    """Center EMA (LstmDistillation.py:146-159). teacher_output: (M, D) —
    all teacher views flattened. `pmean` over the data axis replaces
    dist.all_reduce + world-size division."""
    batch_center = jnp.mean(teacher_output, axis=0, keepdims=True)
    if axis_name is not None:
        batch_center = jax.lax.pmean(batch_center, axis_name)
    return center * center_momentum + batch_center * (1.0 - center_momentum)


def dino_multicrop_loss(
    student_output: jax.Array,  # (n_crops, B, D) — student on all views
    teacher_output: jax.Array,  # (n_teacher, B, D) — teacher on global views
    center: jax.Array,  # (1, D)
    teacher_temp: jax.Array | float,
    student_temp: float = 0.1,
    center_momentum: float = 0.9,
    axis_name: Optional[str] = None,
    compat_reference_pairing: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Multi-crop DINO CE. Returns (loss, new_center).

    Canonical pairing (dino/main_dino.py:455-468): every (teacher view iq,
    student view v) pair except v == iq.

    `compat_reference_pairing` replicates LstmDistillation.py:128-145 exactly:
    the teacher tensor is chunked into ONE piece, so only student view 0 is
    skipped and each remaining student view pairs against the full stacked
    teacher (5 loss terms for 6 crops) — kept as a documented behavior flag.
    """
    n_crops = student_output.shape[0]
    n_teacher = teacher_output.shape[0]
    student_log = jax.nn.log_softmax(student_output / student_temp, axis=-1)
    teacher_probs = jax.lax.stop_gradient(
        jax.nn.softmax((teacher_output - center[None]) / teacher_temp, axis=-1)
    )

    total = 0.0
    n_terms = 0
    if compat_reference_pairing:
        for v in range(1, n_crops):
            ce = -jnp.sum(teacher_probs * student_log[v][None], axis=-1)  # (n_teacher, B)
            total = total + jnp.mean(ce)
            n_terms += 1
    else:
        for iq in range(n_teacher):
            for v in range(n_crops):
                if v == iq:
                    continue
                ce = -jnp.sum(teacher_probs[iq] * student_log[v], axis=-1)
                total = total + jnp.mean(ce)
                n_terms += 1
    if n_terms == 0:
        raise ValueError(
            "dino_multicrop_loss: no (teacher, student) pair survives the "
            "v == iq skip — need at least 2 crops (or 2 teacher views); "
            "got n_teacher=1, n_crops=1"
        )
    loss = total / n_terms
    new_center = update_center(
        center, teacher_output.reshape(-1, teacher_output.shape[-1]), center_momentum, axis_name
    )
    return loss, new_center


def dino_single_pair_loss(
    student_output: jax.Array,  # (B, D)
    teacher_output: jax.Array,  # (B, D)
    center: jax.Array,
    teacher_temp: jax.Array | float,
    student_temp: float = 0.1,
    center_momentum: float = 0.9,
    axis_name: Optional[str] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Single-pair variant (LstmDistillFromDinoV2Train.py:62-94): direct CE
    between centered teacher softmax and student log-softmax."""
    student_log = jax.nn.log_softmax(student_output / student_temp, axis=-1)
    teacher_probs = jax.lax.stop_gradient(
        jax.nn.softmax((teacher_output - center) / teacher_temp, axis=-1)
    )
    loss = jnp.mean(jnp.sum(-teacher_probs * student_log, axis=-1))
    new_center = update_center(center, teacher_output, center_momentum, axis_name)
    return loss, new_center
