"""Cross-modal Barlow Twins training (EEG-BarlowNetworks/train.py:50-190).

Per step (call stack SURVEY.md §3.4): y1 = augmented image, y2 = mel-
spectrogram stack of the EEG — the reference computes librosa mels on the
host per batch (train.py:144-145, the pipeline bottleneck); here the WHOLE
corpus is spectrogrammed once on device (cerebra.signal.spectro) and steps
just index it. LARS with separate weight/bias learning rates
(learning_rate_weights=0.2 / learning_rate_biases=0.0048, optim.py:5-44
bias/norm-filtered variant) under the warmup+cosine schedule
(barlow_utils.py:8-21). BatchNorm statistics are carried explicitly
(batch_stats collection).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Callable, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from cerebra.data.sampling import epoch_batches
from cerebra.losses import barlow_twins_loss
from cerebra.models.barlow import BarlowTwins
from cerebra.train.schedules import barlow_learning_rate
from cerebra.train.resume import check_finite_loss


@dataclasses.dataclass
class BarlowConfig:
    """Defaults from EEG-BarlowNetworks/train.py:32-43."""

    epochs: int = 10
    batch_size: int = 16
    learning_rate_weights: float = 0.2
    learning_rate_biases: float = 0.0048
    weight_decay: float = 1e-6
    lambd: float = 0.0051
    projector: Tuple[int, ...] = (8192, 8192, 8192)
    n_mels: int = 224
    image_size: int = 224
    warmup_epochs: int = 10
    seed: int = 0
    dtype: Any = None
    # optional local torchvision resnet50 checkpoint for both towers
    # (extension — the reference towers are random-init, net.py:15-19)
    pretrained_backbone: str = ""
    # nested stage+block remat in both ResNet towers (memory lever for
    # large per-chip batches; B=512 needs it on 16 GB HBM)
    remat: bool = False


def barlow_train(
    images: np.ndarray,  # (N, H, W, 3) NHWC
    eeg: np.ndarray,  # (N, T, C) — spectrogrammed here
    config: BarlowConfig = BarlowConfig(),
    sample_rate: float = 256.0,
    mesh=None,
    log_fn: Callable[[str], None] = print,
) -> Tuple[dict, Dict[str, List]]:
    """Returns ({'params', 'batch_stats'}, history).

    With a mesh, each global batch is sharded over the data axis (the
    multiproc-DDP world of EEG-BarlowNetworks/train.py:71-99): jit inserts
    the gradient psum, the batch-summed cross-correlation reduces globally
    (the dist.all_reduce(c) at net.py:38), and BatchNorm statistics are
    computed over the GLOBAL batch — SyncBN (train.py:89-90) — because the
    batch mean/var contraction crosses the sharded axis.
    """
    cfg = config
    n = len(images)
    niter = max(n // cfg.batch_size, 1)
    if mesh is not None and cfg.batch_size % mesh.shape[mesh.axis_names[0]] != 0:
        # reference asserts batch divisibility too (train.py:129)
        raise ValueError(
            f"batch_size {cfg.batch_size} not divisible by data-axis size "
            f"{mesh.shape[mesh.axis_names[0]]}"
        )

    # 1) device spectrogram of the whole EEG corpus, CHUNKED under one jit:
    # eagerly, the stft chain (framed copies, complex spectrum, |.|²) holds
    # ~13 GB of live intermediates at n=2048 — that transient peak, not the
    # training program, is what OOM'd Barlow B=512. One jitted signature per
    # chunk width keeps the peak at ~1/8th and lets XLA free intermediates.
    from cerebra.signal.spectro import mel_filterbank, melspectrogram

    eeg_ct = jnp.swapaxes(jnp.asarray(eeg, dtype=jnp.float32), 1, 2)  # (N, C, T)
    t_len = eeg_ct.shape[-1]
    mel_fft = int(2 ** np.floor(np.log2(max(t_len, 2)))) if t_len < 2048 else 2048
    mel_w = jnp.asarray(
        mel_filterbank(sample_rate, mel_fft, cfg.n_mels), jnp.float32
    )

    @jax.jit
    def _spect_chunk(e):  # (n_chunk, C, T) → (n_chunk, M, F, C) NHWC
        m = melspectrogram(e, sr=sample_rate, n_mels=cfg.n_mels, mel_weights=mel_w)
        return jnp.transpose(m, (0, 2, 3, 1))

    chunk = 256
    if n <= chunk:
        y2_all = _spect_chunk(eeg_ct)
    else:
        n_pad = -n % chunk  # pad to one signature; sliced off below
        ep = jnp.pad(eeg_ct, ((0, n_pad), (0, 0), (0, 0))) if n_pad else eeg_ct
        y2_all = jnp.concatenate(
            [_spect_chunk(ep[i : i + chunk]) for i in range(0, n + n_pad, chunk)]
        )[:n]
    del eeg_ct  # ~0.4 GB at corpus scale; not needed for the whole run
    y1_all = jnp.asarray(images, dtype=jnp.float32)

    model = BarlowTwins(projector_sizes=cfg.projector, eeg_in_channels=eeg.shape[-1],
                        dtype=cfg.dtype, remat=cfg.remat)
    variables = model.init(
        jax.random.key(cfg.seed), y1_all[:1], y2_all[:1], train=False
    )
    if cfg.pretrained_backbone:
        from cerebra.models.barlow import graft_pretrained_towers

        variables = graft_pretrained_towers(variables, cfg.pretrained_backbone)
    params, batch_stats = variables["params"], variables.get("batch_stats", {})

    # 2) LARS with per-group lr (weights vs biases/1-d), warmup+cosine base
    base = barlow_learning_rate(cfg.epochs, niter, cfg.batch_size, cfg.warmup_epochs)
    lr_w = jnp.asarray(base * cfg.learning_rate_weights, dtype=jnp.float32)
    lr_b = jnp.asarray(base * cfg.learning_rate_biases, dtype=jnp.float32)

    def sched(arr):
        return lambda step: arr[jnp.minimum(step, arr.shape[0] - 1)]

    labels = jax.tree.map(lambda p: "w" if jnp.ndim(p) > 1 else "b", params)
    tx = optax.multi_transform(
        {
            "w": optax.lars(sched(lr_w), weight_decay=cfg.weight_decay,
                            trust_coefficient=0.001),
            "b": optax.lars(sched(lr_b), weight_decay=0.0, trust_coefficient=0.001,
                            trust_ratio_mask=False),
        },
        labels,
    )
    opt_state = tx.init(params)

    def step(params, batch_stats, opt_state, y1, y2):
        def loss_fn(p):
            (z1, z2), updates = model.apply(
                {"params": p, "batch_stats": batch_stats}, y1, y2, train=True,
                mutable=["batch_stats"],
            )
            loss = barlow_twins_loss(z1, z2, lambd=cfg.lambd,
                                     global_batch_size=y1.shape[0])
            return loss, updates["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_stats, new_opt, loss

    # whole-epoch lax.scan dispatch in both branches (same shape as
    # cerebra.train.recipes); meshed, the spectrogram/image corpora are
    # statically sharded and gathered shard-locally per step
    import functools

    if mesh is None:

        @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
        def run_epoch(params, batch_stats, opt_state, idx_mat, y1, y2):
            def body(carry, idx):
                p, bs, op = carry
                p, bs, op, loss = step(p, bs, op, y1[idx], y2[idx])
                return (p, bs, op), loss

            (params, batch_stats, opt_state), losses = jax.lax.scan(
                body, (params, batch_stats, opt_state), idx_mat
            )
            return params, batch_stats, opt_state, losses

        def epoch_call(params, batch_stats, opt_state, epoch):
            batches, _ = epoch_batches(n, cfg.batch_size, seed=cfg.seed, epoch=epoch)
            idx_mat = jnp.asarray(np.stack(batches[:niter]))
            return run_epoch(params, batch_stats, opt_state, idx_mat, y1_all, y2_all)
    else:
        from cerebra.parallel.dataflow import (
            index_spec,
            local_epoch_indices,
            make_local_gather,
            put_global,
            put_replicated,
            shard_corpus,
        )

        n_data = mesh.shape[mesh.axis_names[0]]
        b_local = cfg.batch_size // n_data
        params = put_replicated(mesh, params)
        batch_stats = put_replicated(mesh, batch_stats)
        opt_state = put_replicated(mesh, opt_state)
        y1_g, n_local = shard_corpus(mesh, np.asarray(y1_all))
        y2_g, _ = shard_corpus(mesh, np.asarray(y2_all))
        gather = make_local_gather(mesh)

        @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
        def run_epoch(params, batch_stats, opt_state, idx_all, y1, y2):
            def body(carry, idx):
                p, bs, op = carry
                p, bs, op, loss = step(p, bs, op, gather(y1, idx), gather(y2, idx))
                return (p, bs, op), loss

            (params, batch_stats, opt_state), losses = jax.lax.scan(
                body, (params, batch_stats, opt_state), idx_all
            )
            return params, batch_stats, opt_state, losses

        def epoch_call(params, batch_stats, opt_state, epoch):
            idx = local_epoch_indices(n_local, n_data, b_local, niter, cfg.seed, epoch)
            return run_epoch(
                params, batch_stats, opt_state, put_global(mesh, idx, index_spec()),
                y1_g, y2_g,
            )

    history: Dict[str, List] = {"loss": [], "epoch_time_s": []}
    for epoch in range(cfg.epochs):
        t0 = time.perf_counter()
        params, batch_stats, opt_state, losses = epoch_call(
            params, batch_stats, opt_state, epoch
        )
        loss = float(np.mean(np.asarray(losses)))  # one sync per epoch
        check_finite_loss(loss, epoch)
        history["loss"].append(loss)
        history["epoch_time_s"].append(time.perf_counter() - t0)
        log_fn(f"EPOCH {epoch} barlow_loss: {loss:.4f}")
    return {"params": params, "batch_stats": batch_stats}, history
