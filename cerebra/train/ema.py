"""Teacher EMA update (LstmDistillation.py:616-619; dino momentum schedule
cosine → 1.0, dino/main_dino.py:269-270): one fused tree_map instead of the
reference's Python loop over parameter pairs."""

from __future__ import annotations

import jax


def ema_update(teacher_params, student_params, momentum):
    """teacher ← m·teacher + (1−m)·student, elementwise over the tree."""
    return jax.tree.map(
        lambda t, s: t * momentum + s * (1.0 - momentum), teacher_params, student_params
    )
