"""Jitted training steps for the reference recipes.

Everything inside a step is traced once and compiled: model forward/backward,
loss, optimizer, EMA, schedule indexing (precomputed arrays indexed by a
traced step counter — the reference's own pattern, LstmDistillation.py:
543-547). Data parallelism: the caller shards the batch over the mesh's
"data" axis (cerebra.parallel.mesh.shard_batch) and keeps state replicated;
jit inserts the gradient all-reduce (the DDP equivalent).
"""

from __future__ import annotations


from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax.training import train_state

from cerebra.losses import dino_multicrop_loss
from cerebra.models.multicrop import multicrop_forward
from cerebra.signal.windows import multicrop_views
from cerebra.train.ema import ema_update
from cerebra.train.optim import cancel_last_layer_grads


class TrainState(train_state.TrainState):
    """flax TrainState; apply_fn is the model's apply."""


# --------------------------------------------------------------- regression
def make_feature_distill_step(
    model_apply: Callable,
    tx: optax.GradientTransformation,
    loss_fn: Callable,
    donate: bool = True,
    jit: bool = True,
):
    """Step for the LstmDistillFromDinoV2Train recipe (call stack SURVEY.md
    §3.1): LSTM forward on EEG → loss against cached teacher features.

    loss_fn(feats, cls_pred, teacher_feats, labels, epoch) → scalar.
    """

    def step(state: TrainState, eeg, teacher_feats, labels, epoch):
        def compute_loss(params):
            out = model_apply({"params": params}, eeg)
            feats, cls_pred = out if isinstance(out, tuple) else (out, None)
            return loss_fn(feats, cls_pred, teacher_feats, labels, epoch)

        loss, grads = jax.value_and_grad(compute_loss)(state.params)
        state = state.apply_gradients(grads=grads)
        return state, {"loss": loss}

    if not jit:
        return step  # raw step: callers embed it in a lax.scan epoch loop
    return jax.jit(step, donate_argnums=(0,) if donate else ())


# ------------------------------------------------------------------- DINO
class DinoTrainState(NamedTuple):
    """Student params+opt, teacher params, center — the reference checkpoint
    trio student/teacher/dino_loss (LstmDistillation.py:634-646)."""

    step: jax.Array
    student_params: Any
    teacher_params: Any
    opt_state: Any
    center: jax.Array


def make_dino_step(
    backbone_apply: Callable,  # (params, group_batch) -> (M, E) features
    head_apply: Callable,  # (params, (M,E)) -> (M,D)
    tx: optax.GradientTransformation,
    lr_schedule: jnp.ndarray,
    wd_schedule: jnp.ndarray,
    momentum_schedule: jnp.ndarray,
    teacher_temp_by_epoch: jnp.ndarray,
    niter_per_ep: int,
    view_fn: Optional[Callable] = None,  # (key, batch) -> [group (n_v,B,...)]
    global_length: int = 300,
    local_length: int = 200,
    n_global: int = 2,
    n_local: int = 4,
    student_temp: float = 0.1,
    center_momentum: float = 0.9,
    freeze_last_layer: int = 1,
    compat_reference_pairing: bool = False,
    jit: bool = True,
    student_backbone_apply: Optional[Callable] = None,  # (params, x, key)
):
    """One DINO iteration (call stack SURVEY.md §3.2), fully fused: view
    construction (default: random temporal multi-crop; pluggable via
    `view_fn`, e.g. EEG-as-image + image crops for the main_dino recipe),
    teacher/student forwards (one batched forward per resolution group),
    multi-crop DINO loss, per-param clip + last-layer cancel, optimizer with
    scheduled lr/wd, teacher EMA, center EMA — a single jitted function.

    The FIRST view group is global (teacher consumes it); remaining groups
    are student-only (LstmDistillation.py:584-592).

    ``student_backbone_apply``: optional stochastic student forward
    ``(params, x, key) -> features`` — the reference trains the main_dino
    student with drop_path_rate=0.1 (dino/main_dino.py:105,183) while the
    teacher stays deterministic. When provided, the step key is split
    between view construction and the student's dropout rng; when absent
    (default) the student uses ``backbone_apply`` and the key flow is
    unchanged (bit-compatible with earlier recipes).
    """

    if view_fn is None:
        def view_fn(key, eeg):  # noqa: F811 — default temporal multicrop
            g, l = multicrop_views(key, eeg, global_length, local_length, n_global, n_local)
            return [g, l]

    def params_of(p):
        return {"params": p}

    def step(state: DinoTrainState, batch, key):
        it = state.step
        epoch = it // niter_per_ep
        lr = lr_schedule[it]
        wd = wd_schedule[it]
        m = momentum_schedule[it]
        t_temp = teacher_temp_by_epoch[epoch]

        if student_backbone_apply is not None:
            key, drop_key = jax.random.split(key)
        groups = view_fn(key, batch)
        n_teacher = groups[0].shape[0]
        n_crops = sum(int(g.shape[0]) for g in groups)
        B = groups[0].shape[1]

        # teacher: only the global group (LstmDistillation.py:584-586)
        t_backbone = lambda x: backbone_apply(params_of(state.teacher_params["backbone"]), x)
        t_head = lambda f: head_apply(params_of(state.teacher_params["head"]), f)
        teacher_out = multicrop_forward(t_backbone, t_head, [groups[0]])
        teacher_out = teacher_out.reshape(n_teacher, B, -1)
        teacher_out = jax.lax.stop_gradient(teacher_out)

        def compute_loss(student_params):
            s_head = lambda f: head_apply(params_of(student_params["head"]), f)
            if student_backbone_apply is not None:
                # per-GROUP dropout key (fold the group index in: two groups
                # with the same token height must not share drop-path masks
                # — the reference draws fresh randomness per forward)
                s_backbone = lambda x, gi: student_backbone_apply(
                    params_of(student_params["backbone"]), x,
                    jax.random.fold_in(drop_key, gi),
                )
                student_out = multicrop_forward(
                    s_backbone, s_head, groups, backbone_takes_group_index=True
                )
            else:
                s_backbone = lambda x: backbone_apply(params_of(student_params["backbone"]), x)
                student_out = multicrop_forward(s_backbone, s_head, groups)
            student_out = student_out.reshape(n_crops, B, -1)
            loss, new_center = dino_multicrop_loss(
                student_out,
                teacher_out,
                state.center,
                teacher_temp=t_temp,
                student_temp=student_temp,
                center_momentum=center_momentum,
                compat_reference_pairing=compat_reference_pairing,
            )
            return loss, new_center

        (loss, new_center), grads = jax.value_and_grad(compute_loss, has_aux=True)(
            state.student_params
        )
        grads = cancel_last_layer_grads(grads, epoch, freeze_last_layer)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.student_params)
        new_student = optax.apply_updates(state.student_params, updates)
        new_teacher = ema_update(state.teacher_params, new_student, m)
        new_state = DinoTrainState(
            step=it + 1,
            student_params=new_student,
            teacher_params=new_teacher,
            opt_state=new_opt_state,
            center=new_center,
        )
        return new_state, {"loss": loss, "lr": lr, "wd": wd, "momentum": m}

    if not jit:
        return step  # raw step: callers embed it in a lax.scan epoch loop
    return jax.jit(step, donate_argnums=(0,))


def make_scheduled_optimizer(
    name: str,
    lr_schedule,
    wd_schedule=None,
    params_mask_source=None,
    clip_grad: Optional[float] = None,
) -> optax.GradientTransformation:
    """Optimizer whose lr (and optionally weight decay) follow precomputed
    arrays indexed by the optimizer step — mirrors the reference's
    per-iteration param_group mutation (LstmDistillation.py:543-547)."""
    import numpy as np

    from cerebra.train.optim import make_optimizer, no_weight_decay_mask, per_param_clip

    lr_arr = jnp.asarray(np.asarray(lr_schedule), dtype=jnp.float32)

    def lr_fn(step):
        return lr_arr[jnp.minimum(step, lr_arr.shape[0] - 1)]

    if wd_schedule is None:
        return make_optimizer(
            name, lr_fn, params_mask_source=params_mask_source, clip_grad=clip_grad
        )

    if name != "adamw":
        raise ValueError("scheduled weight decay is an AdamW recipe (dino/main_dino.py:245-267)")
    wd_arr = jnp.asarray(np.asarray(wd_schedule), dtype=jnp.float32)

    def wd_fn(step):
        return wd_arr[jnp.minimum(step, wd_arr.shape[0] - 1)]

    mask = no_weight_decay_mask(params_mask_source) if params_mask_source is not None else None

    @optax.inject_hyperparams
    def _adamw(learning_rate, weight_decay):
        return optax.adamw(learning_rate, weight_decay=weight_decay, mask=mask)

    tx = _adamw(learning_rate=lr_fn, weight_decay=wd_fn)
    if clip_grad is not None:
        tx = optax.chain(per_param_clip(clip_grad), tx)
    return tx
