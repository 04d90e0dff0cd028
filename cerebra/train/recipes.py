"""End-to-end training recipes (the reference's L5 entry-point loops as
library functions; CLIs are thin argparse wrappers around these).

- `feature_distill_train`: LstmDistillFromDinoV2Train.py:351-440 — LSTM
  regresses EEG windows onto cached teacher (DINOv2) features with
  FeatureDistributionLoss v1; RMSprop; retrieval eval every
  `validation_frequency` epochs with best-checkpoint tracking.
- `dino_selfdistill_train`: LstmDistillation.py:526-651 — DINO student/
  teacher LSTMs with temporal multi-crop, EMA teacher, centered/sharpened CE,
  cosine lr/wd/momentum schedules.

TPU shape: whole corpora live as device arrays and an epoch runs as ONE
`lax.scan` dispatch (no host dataloader). With a mesh the corpus is
statically sharded over the data axis and every device gathers batches from
its own shard (cerebra.parallel.dataflow) — multi-process/multi-host safe.
"""

from __future__ import annotations

import dataclasses
import functools
import time
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cerebra.data.sampling import epoch_batches
from cerebra.eval.retrieval import retrieval_recall_precision
from cerebra.losses import feature_distribution_loss_v1, teacher_temp_schedule
from cerebra.models import DINOHead, Model
from cerebra.train.optim import make_optimizer
from cerebra.train.schedules import cosine_scheduler
from cerebra.train.resume import check_finite_loss
from cerebra.train.steps import (
    DinoTrainState,
    TrainState,
    make_dino_step,
    make_feature_distill_step,
    make_scheduled_optimizer,
)


@dataclasses.dataclass
class FeatureDistillConfig:
    """Defaults = LstmDistillFromDinoV2Train.py flags/HyperParams
    (:16-25, :329: RMSprop lr 1e-3, batch 16, warmup T 1.5→0.22 over 50).

    `loss` selects the recipe variant:
      feature_dist_v1 — LstmDistillFromDinoV2Train (CE + softened CE)
      hinton_kd       — LstmDistillFromDinoV2TrainSpampinato (KLDiv·αT² + CE)
      cosine          — LSTMDistill (1 − mean cos)
      feature_dist_v2 — mean/std matching MSE (LstmDistillation variant)
      feature_dist_v3 — soft-target KL·T² (Eval variant)
    """

    num_epochs: int = 100
    batch_size: int = 16
    learning_rate: float = 1e-3
    optimizer: str = "rmsprop"
    lstm_size: int = 96
    lstm_layers: int = 2
    loss: str = "feature_dist_v1"
    alpha: float = 0.5
    beta: float = 0.5
    kd_temperature: float = 2.0
    warmup_teacher_temp: float = 1.5
    teacher_temp: float = 0.22
    warmup_teacher_temp_epochs: int = 50
    validation_frequency: int = 5
    top_k: int = 5
    seed: int = 43
    dtype: Any = None


def feature_distill_train(
    train_eeg: np.ndarray,  # (Nt, T, C)
    train_feats: np.ndarray,  # (Nt, F) cached teacher features
    train_labels: np.ndarray,  # (Nt,)
    val_eeg: np.ndarray,
    val_feats: np.ndarray,
    val_labels: np.ndarray,
    config: FeatureDistillConfig = FeatureDistillConfig(),
    mesh=None,
    n_classes: Optional[int] = None,
    log_fn: Callable[[str], None] = print,
) -> Tuple[TrainState, Dict[str, List]]:
    """The README-blessed train() recipe. Returns (state, history)."""
    cfg = config
    n_channels = train_eeg.shape[-1]
    feat_dim = train_feats.shape[-1]
    if n_classes is None:
        n_classes = int(max(train_labels.max(), val_labels.max())) + 1

    model = Model(
        input_size=n_channels,
        lstm_size=cfg.lstm_size,
        lstm_layers=cfg.lstm_layers,
        output_size=feat_dim,
        include_top=True,
        input_grad=False,  # EEG is data: skip the kernel's dx stream
        n_classes=n_classes,
        dtype=cfg.dtype,
    )
    key = jax.random.key(cfg.seed)
    params = model.init(key, jnp.asarray(train_eeg[:1]))["params"]
    tx = make_optimizer(cfg.optimizer, cfg.learning_rate)
    state = TrainState.create(apply_fn=model.apply, params=params, tx=tx)

    temps = jnp.asarray(
        teacher_temp_schedule(
            cfg.warmup_teacher_temp, cfg.teacher_temp, cfg.warmup_teacher_temp_epochs,
            cfg.num_epochs,
        ),
        dtype=jnp.float32,
    )

    from cerebra.losses import (
        cosine_similarity_loss,
        feature_distribution_loss_v2,
        feature_distribution_loss_v3,
        hinton_kd_loss,
    )

    def loss_fn(feats, cls_pred, teacher_feats, labels, epoch):
        if cfg.loss == "feature_dist_v1":
            return feature_distribution_loss_v1(
                feats, teacher_feats, labels, cls_pred, temperature=temps[epoch],
                alpha=cfg.alpha, beta=cfg.beta,
            )
        if cfg.loss == "hinton_kd":
            # Spampinato recipe (LstmDistillFromDinoV2TrainSpampinato.py:424):
            # KD over the regressed FEATURES as logits
            return hinton_kd_loss(feats, labels, teacher_feats, cfg.kd_temperature, cfg.alpha)
        if cfg.loss == "cosine":
            return cosine_similarity_loss(feats, teacher_feats)
        if cfg.loss == "feature_dist_v2":
            return feature_distribution_loss_v2(feats, teacher_feats)
        if cfg.loss == "feature_dist_v3":
            return feature_distribution_loss_v3(feats, teacher_feats, temps[epoch])
        raise ValueError(f"unknown loss: {cfg.loss}")

    # Device-resident corpora; BOTH branches run a whole epoch as ONE
    # lax.scan dispatch (gather inside jit). Single chip gathers from the
    # full corpus; meshed, each device owns a static shard of the
    # wrap-padded corpus and gathers shard-locally (no sample dropped, no
    # per-step host work — cerebra.parallel.dataflow replaces the
    # DistributedSampler + per-batch device_put of the reference,
    # LstmDistillation.py:406-414).
    if mesh is not None:
        from cerebra.parallel.dataflow import (
            index_spec,
            local_epoch_indices,
            make_local_gather,
            put_global,
            put_replicated,
            shard_corpus,
        )

        raw_step = make_feature_distill_step(model.apply, tx, loss_fn, jit=False)
        state = put_replicated(mesh, state)
        n_data = mesh.shape[mesh.axis_names[0]]
        if cfg.batch_size % n_data:
            # the reference asserts batch divisibility by the world size too
            # (EEG-BarlowNetworks/train.py:129)
            raise ValueError(
                f"batch_size {cfg.batch_size} not divisible by data-axis size {n_data}"
            )
        b_local = cfg.batch_size // n_data
        eeg_g, n_local = shard_corpus(mesh, np.asarray(train_eeg, dtype=np.float32))
        feats_g, _ = shard_corpus(mesh, np.asarray(train_feats, dtype=np.float32))
        labels_g, _ = shard_corpus(mesh, np.asarray(train_labels))
        gather = make_local_gather(mesh)
        n_steps = -(-n_local // b_local)  # every sample trains (wrap, no drop)

        @functools.partial(jax.jit, donate_argnums=(0,))
        def run_epoch_meshed(state, idx_all, epoch, eeg, feats, labels):
            def body(st, idx):
                st, metrics = raw_step(
                    st, gather(eeg, idx), gather(feats, idx), gather(labels, idx), epoch
                )
                return st, metrics["loss"]

            return jax.lax.scan(body, state, idx_all)

        def epoch_call(state, epoch):
            idx = local_epoch_indices(n_local, n_data, b_local, n_steps, cfg.seed, epoch)
            idx_d = put_global(mesh, idx, index_spec())
            state, losses = run_epoch_meshed(
                state, idx_d, epoch, eeg_g, feats_g, labels_g
            )
            return state, losses, n_steps * cfg.batch_size
    else:
        raw_step = make_feature_distill_step(model.apply, tx, loss_fn, jit=False)
        tail_step = make_feature_distill_step(model.apply, tx, loss_fn)
        train_eeg_d = jnp.asarray(train_eeg)
        train_feats_d = jnp.asarray(train_feats)
        train_labels_d = jnp.asarray(train_labels)

        @functools.partial(jax.jit, donate_argnums=(0,))
        def run_batches(state, idx_mat, epoch, eeg, feats, labels):
            # corpora are runtime ARGUMENTS (closure capture would bake them
            # into the compiled HLO as constants)
            def body(st, idx):
                st, metrics = raw_step(st, eeg[idx], feats[idx], labels[idx], epoch)
                return st, metrics["loss"]

            return jax.lax.scan(body, state, idx_mat)

        def epoch_call(state, epoch):
            # full-size batches + one ragged tail batch (reference DataLoader
            # semantics: no duplicated samples; the tail has its own jit
            # signature, compiled once)
            n_train = len(train_eeg)
            order = np.random.default_rng((cfg.seed, epoch)).permutation(n_train)
            full_n = n_train // cfg.batch_size * cfg.batch_size
            batches = list(order[:full_n].reshape(-1, cfg.batch_size))
            if full_n < n_train:
                batches.append(order[full_n:])
            full = [b for b in batches if len(b) == cfg.batch_size]
            losses = jnp.zeros((0,), jnp.float32)
            n_seen = 0
            if full:
                state, losses = run_batches(
                    state, jnp.asarray(np.stack(full)), epoch,
                    train_eeg_d, train_feats_d, train_labels_d,
                )
                n_seen += len(full) * cfg.batch_size
            for idx in batches:
                if len(idx) == cfg.batch_size:
                    continue
                state, metrics = tail_step(
                    state, train_eeg_d[jnp.asarray(idx)], train_feats_d[jnp.asarray(idx)],
                    train_labels_d[jnp.asarray(idx)], epoch,
                )
                losses = jnp.concatenate([losses, metrics["loss"][None]])
                n_seen += len(idx)
            return state, losses, n_seen

    transform = jax.jit(lambda p, x: model.apply({"params": p}, x)[0])

    def corpus_features(p, eeg):
        return np.asarray(transform(p, jnp.asarray(eeg)))

    history: Dict[str, List] = {"train_loss": [], "val_loss": [], "recall": [], "precision": [],
                                "epoch_time_s": [], "windows_per_s": []}
    best_val, best_epoch, best_params = None, -1, None

    for epoch in range(cfg.num_epochs):
        t0 = time.perf_counter()
        state, losses, n_seen = epoch_call(state, epoch)
        # one sync per epoch; np.asarray also handles multi-process global
        # arrays (scan losses are fully replicated)
        epoch_loss = float(np.mean(np.asarray(losses)))
        check_finite_loss(epoch_loss, epoch)
        dt = time.perf_counter() - t0
        history["train_loss"].append(epoch_loss)
        history["epoch_time_s"].append(dt)
        history["windows_per_s"].append(n_seen / dt)

        if cfg.validation_frequency and epoch % cfg.validation_frequency == 0 and epoch > 0:
            # under a mesh the params are global (possibly multi-process)
            # arrays; validation runs process-locally on a host copy (they
            # are fully replicated, so np.asarray is legal everywhere)
            p_local = (
                state.params if mesh is None else jax.tree.map(np.asarray, state.params)
            )
            gallery = corpus_features(p_local, train_eeg)
            query = corpus_features(p_local, val_eeg)
            recall, precision, _, _ = retrieval_recall_precision(
                jnp.asarray(gallery), jnp.asarray(query),
                jnp.asarray(train_labels), jnp.asarray(val_labels), k=cfg.top_k,
            )
            history["recall"].append((epoch, recall))
            history["precision"].append((epoch, precision))

            vfeats, vcls = model.apply({"params": p_local}, jnp.asarray(val_eeg))
            val_loss = float(
                loss_fn(vfeats, vcls, jnp.asarray(val_feats), jnp.asarray(val_labels), epoch)
            )
            history["val_loss"].append((epoch, val_loss))
            if best_val is None or val_loss < best_val:
                best_val, best_epoch = val_loss, epoch
                best_params = jax.tree.map(np.asarray, state.params)
            log_fn(
                f"EPOCH {epoch} train_loss: {epoch_loss:.6f} val_loss: {val_loss:.6f} "
                f"R: {recall:.2f} P: {precision:.2f} best: {best_val:.6f}@{best_epoch}"
            )
        else:
            log_fn(f"EPOCH {epoch} train_loss: {epoch_loss:.6f}")

    history["best"] = [(best_epoch, best_val)]
    history["best_params"] = [best_params]
    return state, history


@dataclasses.dataclass
class DinoSelfDistillConfig:
    """Defaults = LstmDistillation.py flags (:195-346): out_dim 384,
    momentum 0.996, teacher_temp 0.04 with warmup, batch/gpu 8, AdamW,
    crops 2×300 + 4×200."""

    epochs: int = 100
    batch_size_per_device: int = 8
    out_dim: int = 384
    embed_dim: int = 128
    lstm_layers: int = 4
    lr: float = 0.0005
    min_lr: float = 1e-6
    warmup_epochs: int = 10
    weight_decay: float = 0.04
    weight_decay_end: float = 0.4
    momentum_teacher: float = 0.996
    teacher_temp: float = 0.04
    warmup_teacher_temp: float = 0.04
    warmup_teacher_temp_epochs: int = 0
    clip_grad: float = 3.0
    freeze_last_layer: int = 1
    global_length: int = 300
    local_length: int = 200
    n_global: int = 2
    n_local: int = 4
    norm_last_layer: bool = True
    use_bn_in_head: bool = False
    compat_reference_pairing: bool = False
    seed: int = 0
    dtype: Any = None


def build_dino_models(n_channels: int, cfg: DinoSelfDistillConfig):
    backbone = Model(
        input_size=n_channels, lstm_size=cfg.embed_dim, lstm_layers=cfg.lstm_layers,
        output_size=cfg.embed_dim, include_top=False, dtype=cfg.dtype,
        input_grad=False,  # temporal crops of data EEG: dx is dead
    )
    head = DINOHead(
        in_dim=cfg.embed_dim, out_dim=cfg.out_dim, use_bn=cfg.use_bn_in_head,
        norm_last_layer=cfg.norm_last_layer, dtype=cfg.dtype,
    )
    return backbone, head


def dino_selfdistill_train(
    train_eeg: np.ndarray,  # (N, T, C)
    config: DinoSelfDistillConfig = DinoSelfDistillConfig(),
    mesh=None,
    log_fn: Callable[[str], None] = print,
    checkpoint_cb: Optional[Callable[[int, DinoTrainState], None]] = None,
    resume=None,  # cerebra.train.resume.AutoResume for preemption-safe restarts
    resume_pth: Optional[str] = None,  # reference-layout checkpoint.pth
) -> Tuple[DinoTrainState, Dict[str, List]]:
    """LstmDistillation recipe (SURVEY.md §3.2). Returns (state, history).

    `resume_pth` restarts from a reference-layout torch checkpoint —
    student/teacher/center/epoch AND the torch-AdamW optimizer moments
    (restart_from_checkpoint semantics, utils/utils.py:152-184), so a run
    started under the reference continues here without resetting Adam."""
    cfg = config
    # DP width is the DATA axis (a "model" axis, if present, shards tensors
    # inside the step, not the batch)
    n_devices = 1 if mesh is None else mesh.shape[mesh.axis_names[0]]
    global_batch = cfg.batch_size_per_device * n_devices
    n = len(train_eeg)
    niter_per_ep = max(n // global_batch, 1)
    n_channels = train_eeg.shape[-1]

    backbone, head = build_dino_models(n_channels, cfg)
    key = jax.random.key(cfg.seed)
    k1, k2, key = jax.random.split(key, 3)
    dummy = jnp.zeros((1, cfg.global_length, n_channels), dtype=jnp.float32)
    b_params = backbone.init(k1, dummy, features_only=True)["params"]
    h_params = head.init(k2, jnp.zeros((1, cfg.embed_dim)))["params"]
    student_params = {"backbone": b_params, "head": h_params}
    teacher_params = jax.tree.map(jnp.copy, student_params)  # teacher ← student init

    # linear-scaling rule (dino/main_dino.py:257-262)
    lr_schedule = cosine_scheduler(
        cfg.lr * global_batch / 256.0, cfg.min_lr, cfg.epochs, niter_per_ep,
        warmup_epochs=min(cfg.warmup_epochs, cfg.epochs),
    )
    wd_schedule = cosine_scheduler(cfg.weight_decay, cfg.weight_decay_end, cfg.epochs, niter_per_ep)
    momentum_schedule = cosine_scheduler(cfg.momentum_teacher, 1.0, cfg.epochs, niter_per_ep)
    temps = teacher_temp_schedule(
        cfg.warmup_teacher_temp, cfg.teacher_temp, cfg.warmup_teacher_temp_epochs, cfg.epochs
    )

    tx = make_scheduled_optimizer(
        "adamw", lr_schedule, wd_schedule, params_mask_source=student_params,
        clip_grad=cfg.clip_grad,
    )
    state = DinoTrainState(
        step=jnp.zeros([], jnp.int32),
        student_params=student_params,
        teacher_params=teacher_params,
        opt_state=tx.init(student_params),
        center=jnp.zeros((1, cfg.out_dim), dtype=jnp.float32),
    )

    pth_start_epoch = 0
    if resume_pth:
        from cerebra.train.checkpoints import import_dino_pth

        student, teacher, center, ck_epoch, opt_state = import_dino_pth(
            resume_pth, opt_state_template=state.opt_state
        )
        if center.shape != (1, cfg.out_dim):  # ckpt without a center slot
            center = np.asarray(state.center)
        pth_start_epoch = min(int(ck_epoch), cfg.epochs)
        state = DinoTrainState(
            step=jnp.asarray(pth_start_epoch * niter_per_ep, jnp.int32),
            student_params=jax.tree.map(jnp.asarray, student),
            teacher_params=jax.tree.map(jnp.asarray, teacher),
            opt_state=opt_state,
            center=jnp.asarray(center, dtype=jnp.float32),
        )
        log_fn(f"resumed from {resume_pth} at epoch {pth_start_epoch} "
               f"(optimizer moments restored)")

    step_kwargs = dict(
        backbone_apply=lambda p, x: backbone.apply(p, x, features_only=True),
        head_apply=lambda p, f: head.apply(p, f),
        tx=tx,
        lr_schedule=jnp.asarray(lr_schedule, dtype=jnp.float32),
        wd_schedule=jnp.asarray(wd_schedule, dtype=jnp.float32),
        momentum_schedule=jnp.asarray(momentum_schedule, dtype=jnp.float32),
        teacher_temp_by_epoch=jnp.asarray(temps, dtype=jnp.float32),
        niter_per_ep=niter_per_ep,
        global_length=cfg.global_length,
        local_length=cfg.local_length,
        n_global=cfg.n_global,
        n_local=cfg.n_local,
        freeze_last_layer=cfg.freeze_last_layer,
        compat_reference_pairing=cfg.compat_reference_pairing,
    )

    # BOTH branches run the WHOLE EPOCH as one lax.scan dispatch — the batch
    # gather, all views, and every optimizer step stay on device (a
    # remote/tunneled host pays real latency per Python-level jax op, and
    # even locally per-step dispatch is dead time between 40 ms steps).
    # Single chip gathers from the full device corpus; meshed, each device
    # owns a static shard and gathers shard-locally (the DistributedSampler
    # + DDP world of LstmDistillation.py:406-445, rebuilt as sharded
    # device-resident dataflow — cerebra.parallel.dataflow).
    raw_step = make_dino_step(jit=False, **step_kwargs)
    if mesh is None:
        eeg_dev = jnp.asarray(np.asarray(train_eeg, dtype=np.float32))

        @functools.partial(jax.jit, donate_argnums=(0,))
        def run_epoch(state, idx_mat, subs, eeg):
            # eeg is a runtime ARGUMENT: closing over the device corpus
            # would bake ~hundreds of MB into the compiled HLO as a constant
            def body(st, args):
                idx, sub = args
                st, metrics = raw_step(st, eeg[idx], sub)
                return st, metrics["loss"]

            return jax.lax.scan(body, state, (idx_mat, subs))

        def epoch_call(state, epoch, subs):
            batches, _ = epoch_batches(n, global_batch, seed=cfg.seed, epoch=epoch)
            batches = batches[:niter_per_ep]
            return run_epoch(state, jnp.asarray(np.stack(batches)), subs, eeg_dev)
    else:
        from cerebra.parallel.dataflow import (
            index_spec,
            local_epoch_indices,
            make_local_gather,
            put_global,
            put_replicated,
            shard_corpus,
        )

        from cerebra.parallel.tp import shard_dino_state

        # TP: prototype layer + center shard over a 'model' axis when present
        state = shard_dino_state(mesh, state, out_dim=cfg.out_dim)
        eeg_g, n_local = shard_corpus(mesh, np.asarray(train_eeg, dtype=np.float32))
        gather = make_local_gather(mesh)

        @functools.partial(jax.jit, donate_argnums=(0,))
        def run_epoch_meshed(state, idx_all, subs, eeg):
            def body(st, args):
                idx, sub = args
                st, metrics = raw_step(st, gather(eeg, idx), sub)
                return st, metrics["loss"]

            return jax.lax.scan(body, state, (idx_all, subs))

        def epoch_call(state, epoch, subs):
            # niter_per_ep steps of batch_size_per_device local draws — the
            # reference's floor(n/global_batch) drop-tail epoch length
            idx = local_epoch_indices(
                n_local, n_devices, cfg.batch_size_per_device, niter_per_ep,
                cfg.seed, epoch,
            )
            return run_epoch_meshed(state, put_global(mesh, idx, index_spec()), subs, eeg_g)
    history: Dict[str, List] = {"loss": [], "epoch_time_s": [], "windows_per_s": []}

    start_epoch = pth_start_epoch
    if pth_start_epoch:
        key = jax.random.fold_in(key, pth_start_epoch * niter_per_ep)
    if resume is not None:
        saved_step, saved = resume.restore_latest(template=state)
        if saved is not None:
            state = saved
            start_epoch = int(saved_step) // niter_per_ep
            # fast-forward the PRNG stream so resumed epochs don't replay the
            # crop/augmentation keys epochs 0..start already consumed
            key = jax.random.fold_in(key, int(saved_step))
            log_fn(f"auto-resume: restored step {int(saved_step)} (epoch {start_epoch})")
        from cerebra.train.resume import install_preemption_handler

        latest = {"state": state}
        install_preemption_handler(lambda: resume.save(int(latest["state"].step), latest["state"]))

    for epoch in range(start_epoch, cfg.epochs):
        t0 = time.perf_counter()
        # one split for the whole epoch (not one dispatch per step); the
        # stream stays keyed off the resume-fast-forwarded `key`
        key, ek = jax.random.split(key)
        subs = jax.random.split(ek, niter_per_ep)
        state, losses = epoch_call(state, epoch, subs)
        if resume is not None:
            latest["state"] = state  # preemption handler granularity: one epoch
        # ONE host sync per epoch (each float() is a round trip);
        # np.asarray also handles multi-process fully-replicated outputs
        loss = float(np.mean(np.asarray(losses)))
        check_finite_loss(loss, epoch)
        dt = time.perf_counter() - t0
        history["loss"].append(loss)
        history["epoch_time_s"].append(dt)
        history["windows_per_s"].append(niter_per_ep * global_batch / dt)
        log_fn(f"EPOCH {epoch} dino_loss: {loss:.6f} ({history['windows_per_s'][-1]:.1f} windows/s)")
        if resume is not None:
            latest["state"] = state
            resume.save(int(state.step), state)
        if checkpoint_cb is not None:
            checkpoint_cb(epoch, state)

    return state, history
