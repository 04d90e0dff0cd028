"""DINO v1 training with EEG-as-image global crops (dino/main_dino.py).

The reference's DataAugmentationDINO (:484-550) replaces BOTH global crops
with EEG rendered as a 224×224×3 image (tile-repeat + random time window,
utils/EEGDataset.py:248-303) while local crops are augmented stimulus-image
crops; student/teacher are DINO ViTs with the standard recipe (EMA teacher,
centering, temp warmup, cosine schedules, AdamW, fp16→bf16).

All view construction happens on device inside the jitted step
(cerebra.signal.windows.tile_eeg_to_image + cerebra.signal.image_aug).
When no stimulus images are available, local crops fall back to EEG-image
crops — a variant the reference itself ships commented-in
(dino/main_dino.py:535-549).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cerebra.data.sampling import epoch_batches
from cerebra.losses import teacher_temp_schedule
from cerebra.models.heads import DINOHead
from cerebra.models.vit import VisionTransformer, vit_base, vit_small, vit_tiny
from cerebra.signal.image_aug import dino_local_crop
from cerebra.signal.windows import tile_eeg_to_image
from cerebra.train.schedules import cosine_scheduler
from cerebra.train.steps import DinoTrainState, make_dino_step, make_scheduled_optimizer
from cerebra.train.resume import check_finite_loss


@dataclasses.dataclass
class DinoVitConfig:
    """Defaults from dino/main_dino.py:50-129."""

    arch: str = "vit_small"
    patch_size: int = 8
    out_dim: int = 65536
    epochs: int = 100
    batch_size_per_device: int = 8
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
    local_crops_number: int = 4
    global_size: int = 224
    local_size: int = 96
    norm_last_layer: bool = True
    use_bn_in_head: bool = False
    seed: int = 0
    dtype: Any = None
    # Pallas flash attention for the global-crop sequences (TPU only; local
    # crops below Attention.flash_min_seq keep the naive path).
    use_flash: bool = False
    # jax.checkpoint each ViT block (save matmul outputs only).
    remat: bool = False
    # fused Pallas MLP half-block in every ViT block (pallas_vit_mlp).
    # None = auto: ON when running on a real TPU (measured +14.1% recipe
    # throughput, BENCH_AUX round 5), OFF elsewhere (interpret mode is for
    # parity tests, not speed).
    use_fused_mlp: Optional[bool] = None
    # fused Pallas attention half-block in every ViT block (pallas_vit_attn).
    # None = auto: ON on a real TPU (measured +29.3% alone, +51.8% recipe
    # throughput combined with the fused MLP, BENCH_AUX round 5), OFF
    # elsewhere.
    use_fused_attn: Optional[bool] = None
    # Mosaic lowering knobs for the fused kernels (flag-level workaround if
    # the real TPU rejects a partial tile — retry fused_attn_pad=128).
    fused_attn_pad: int = 16
    fused_mlp_tile_m: int = 256
    # fused kernels only at token count >= this; the dinoparts decomposition
    # measured the 4×96 local views (N=145) flat-to-worse fused
    fused_min_seq: int = 0
    # student stochastic depth (dino/main_dino.py:105 default 0.1; the
    # teacher is built WITHOUT drop path, :183-190). The fused kernels stay
    # engaged: the per-sample mask/keep factor rides INSIDE them as the
    # branch scale (drawn outside with the plain path's exact rng stream).
    drop_path_rate: float = 0.1


def build_vit(cfg: DinoVitConfig, drop_path_rate: float = 0.0) -> VisionTransformer:
    ctor = {"vit_tiny": vit_tiny, "vit_small": vit_small, "vit_base": vit_base}[cfg.arch]
    on_tpu = jax.default_backend() == "tpu"
    fused_mlp = cfg.use_fused_mlp if cfg.use_fused_mlp is not None else on_tpu
    fused_attn = cfg.use_fused_attn if cfg.use_fused_attn is not None else on_tpu
    return ctor(
        patch_size=cfg.patch_size, img_size=cfg.global_size, dtype=cfg.dtype,
        use_flash=cfg.use_flash, remat=cfg.remat, use_fused_mlp=fused_mlp,
        use_fused_attn=fused_attn, drop_path_rate=drop_path_rate,
        fused_attn_pad=cfg.fused_attn_pad, fused_mlp_tile_m=cfg.fused_mlp_tile_m,
        fused_min_seq=cfg.fused_min_seq,
    )


def make_eeg_image_view_fn(
    n_global: int, n_local: int, global_size: int, local_size: int, has_images: bool
):
    """(key, (eeg (B,T,C), images (B,H,W,3)|None)) → [globals, locals].

    Globals: tiled EEG images with independent random time windows
    (dino/main_dino.py:526-531) — fed RAW, exactly like the reference, which
    passes the EEG tensor without image normalization (note the resulting
    scale mismatch vs ImageNet-normalized local image crops is a property of
    the reference recipe, preserved deliberately).
    Locals: augmented stimulus-image crops, or EEG-image crops without
    stimulus images.
    """

    def one_eeg_image(key, eeg_tc):
        img = tile_eeg_to_image(key, eeg_tc.T, size=global_size)  # (3, S, S)
        return jnp.transpose(img, (1, 2, 0))  # NHWC

    def view_fn(key, batch):
        eeg, images = batch
        B = eeg.shape[0]
        kg, kl = jax.random.split(key)
        g_keys = jax.random.split(kg, n_global * B).reshape(n_global, B)
        globals_ = jax.vmap(jax.vmap(one_eeg_image))(
            g_keys, jnp.broadcast_to(eeg, (n_global,) + eeg.shape)
        )
        l_keys = jax.random.split(kl, n_local * B).reshape(n_local, B)
        if has_images:
            locals_ = jax.vmap(jax.vmap(dino_local_crop, in_axes=(0, 0, None)),
                               in_axes=(0, None, None))(l_keys, images, local_size)
        else:
            def local_eeg(key, eeg_tc):
                img = tile_eeg_to_image(key, eeg_tc.T, size=local_size)
                return jnp.transpose(img, (1, 2, 0))

            locals_ = jax.vmap(jax.vmap(local_eeg))(
                l_keys, jnp.broadcast_to(eeg, (n_local,) + eeg.shape)
            )
        return [globals_, locals_]

    return view_fn


def dino_vit_train(
    eeg: np.ndarray,  # (N, T, C)
    images: Optional[np.ndarray] = None,  # (N, H, W, 3) in [0,1]
    config: DinoVitConfig = DinoVitConfig(),
    mesh=None,
    log_fn: Callable[[str], None] = print,
    checkpoint_cb: Optional[Callable[[int, DinoTrainState], None]] = None,
) -> Tuple[DinoTrainState, Dict[str, List]]:
    """With a mesh, the global batch (= batch_size_per_device × n_devices)
    is sharded over the data axis — the DDP world of dino/main_dino.py:225
    with the grad all-reduce and the DINOLoss center all_reduce (:477) both
    inserted by jit as psums over the sharded batch."""
    cfg = config
    n = len(eeg)
    # DP width = data axis (a "model" axis shards tensors, not the batch)
    n_devices = 1 if mesh is None else mesh.shape[mesh.axis_names[0]]
    global_batch = cfg.batch_size_per_device * n_devices
    niter_per_ep = max(n // global_batch, 1)

    backbone = build_vit(cfg)  # teacher: no drop path (dino/main_dino.py:190)
    embed_dim = backbone.embed_dim
    # student: same param tree (drop_path is parameterless), stochastic
    # depth active in training like the reference (:105,:183)
    student_backbone = (
        build_vit(cfg, drop_path_rate=cfg.drop_path_rate)
        if cfg.drop_path_rate > 0.0 else None
    )

    def student_apply(p, x, rng):
        # per-resolution-group decorrelated masks: fold the view height in
        rng = jax.random.fold_in(rng, x.shape[1])
        return student_backbone.apply(p, x, train=True, rngs={"dropout": rng})
    head = DINOHead(
        in_dim=embed_dim, out_dim=cfg.out_dim, use_bn=cfg.use_bn_in_head,
        norm_last_layer=cfg.norm_last_layer, dtype=cfg.dtype,
    )
    key = jax.random.key(cfg.seed)
    k1, k2, key = jax.random.split(key, 3)
    dummy = jnp.zeros((1, cfg.global_size, cfg.global_size, 3))
    b_params = backbone.init(k1, dummy)["params"]
    h_params = head.init(k2, jnp.zeros((1, embed_dim)))["params"]
    student_params = {"backbone": b_params, "head": h_params}
    teacher_params = jax.tree.map(jnp.copy, student_params)

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
    view_fn = make_eeg_image_view_fn(
        2, cfg.local_crops_number, cfg.global_size, cfg.local_size, images is not None
    )
    step = make_dino_step(
        jit=False,  # embedded in the whole-epoch lax.scan below
        backbone_apply=lambda p, x: backbone.apply(p, x),
        head_apply=lambda p, f: head.apply(p, f),
        student_backbone_apply=None if student_backbone is None else student_apply,
        tx=tx,
        lr_schedule=jnp.asarray(lr_schedule, dtype=jnp.float32),
        wd_schedule=jnp.asarray(wd_schedule, dtype=jnp.float32),
        momentum_schedule=jnp.asarray(momentum_schedule, dtype=jnp.float32),
        teacher_temp_by_epoch=jnp.asarray(temps, dtype=jnp.float32),
        niter_per_ep=niter_per_ep,
        view_fn=view_fn,
        freeze_last_layer=cfg.freeze_last_layer,
    )

    # whole-epoch lax.scan dispatch, same shape as the LSTM recipes
    # (cerebra.train.recipes): no per-step host slicing or device_put —
    # this was the 3× dispatch tax the flagship CLI already shed
    eeg = np.asarray(eeg, dtype=np.float32)
    imgs_host = None if images is None else np.asarray(images, dtype=np.float32)
    import functools

    if mesh is None:
        eeg_dev = jnp.asarray(eeg)
        imgs_dev = None if imgs_host is None else jnp.asarray(imgs_host)

        @functools.partial(jax.jit, donate_argnums=(0,))
        def run_epoch(state, idx_mat, subs, eeg_d, imgs_d):
            # corpora are runtime ARGUMENTS (closure capture would bake them
            # into the compiled HLO as constants)
            def body(st, args):
                idx, sub = args
                batch = (eeg_d[idx], None if imgs_d is None else imgs_d[idx])
                st, metrics = step(st, batch, sub)
                return st, metrics["loss"]

            return jax.lax.scan(body, state, (idx_mat, subs))

        def epoch_call(state, epoch, subs):
            batches, _ = epoch_batches(n, global_batch, seed=cfg.seed, epoch=epoch)
            batches = jnp.asarray(np.stack(batches[:niter_per_ep]))
            return run_epoch(state, batches, subs, eeg_dev, imgs_dev)
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

        # TP: the out_dim-65536 prototype layer + center shard over 'model'
        state = shard_dino_state(mesh, state, out_dim=cfg.out_dim)
        eeg_g, n_local = shard_corpus(mesh, eeg)
        imgs_g = None if imgs_host is None else shard_corpus(mesh, imgs_host)[0]
        gather = make_local_gather(mesh)

        @functools.partial(jax.jit, donate_argnums=(0,))
        def run_epoch(state, idx_all, subs, eeg_d, imgs_d):
            def body(st, args):
                idx, sub = args
                batch = (
                    gather(eeg_d, idx),
                    None if imgs_d is None else gather(imgs_d, idx),
                )
                st, metrics = step(st, batch, sub)
                return st, metrics["loss"]

            return jax.lax.scan(body, state, (idx_all, subs))

        def epoch_call(state, epoch, subs):
            idx = local_epoch_indices(
                n_local, n_devices, cfg.batch_size_per_device, niter_per_ep,
                cfg.seed, epoch,
            )
            return run_epoch(state, put_global(mesh, idx, index_spec()), subs, eeg_g, imgs_g)

    history: Dict[str, List] = {"loss": [], "epoch_time_s": [], "windows_per_s": []}
    for epoch in range(cfg.epochs):
        t0 = time.perf_counter()
        key, ek = jax.random.split(key)
        subs = jax.random.split(ek, niter_per_ep)
        state, losses = epoch_call(state, epoch, subs)
        loss = float(np.mean(np.asarray(losses)))  # one sync per epoch
        check_finite_loss(loss, epoch)
        dt = time.perf_counter() - t0
        history["loss"].append(loss)
        history["epoch_time_s"].append(dt)
        history["windows_per_s"].append(niter_per_ep * global_batch / dt)
        log_fn(
            f"EPOCH {epoch} dino_vit_loss: {loss:.4f} "
            f"({history['windows_per_s'][-1]:.1f} windows/s)"
        )
        if checkpoint_cb is not None:
            checkpoint_cb(epoch, state)
    return state, history
