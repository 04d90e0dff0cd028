"""DINO self-distillation step throughput (the flagship LstmDistillation
recipe, SURVEY.md §3.2): LSTM(96,128,4) student+teacher, DINOHead 384,
2×300 global + 4×200 local temporal crops, EMA, AdamW — one jitted step.

Run SOLO on the chip. Timing differs two step counts with float() syncs
(axon block_until_ready is unreliable).

Usage: python benchmarks/bench_dino.py [batch]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from cerebra.losses import teacher_temp_schedule
from cerebra.train.recipes import DinoSelfDistillConfig, build_dino_models
from cerebra.train.schedules import cosine_scheduler
from cerebra.train.steps import DinoTrainState, make_dino_step, make_scheduled_optimizer


def main(batch=1024):
    B = batch
    n_channels, n_samples = 96, 495
    cfg = DinoSelfDistillConfig(
        epochs=2, batch_size_per_device=B, out_dim=384, embed_dim=128,
        lstm_layers=4, warmup_epochs=0, dtype=jnp.bfloat16,
    )
    rng = np.random.default_rng(0)
    eeg = jnp.asarray(rng.normal(size=(B, n_samples, n_channels)).astype(np.float32))

    backbone, head = build_dino_models(n_channels, cfg)
    k1, k2, key = jax.random.split(jax.random.key(0), 3)
    b_params = backbone.init(
        k1, jnp.zeros((1, cfg.global_length, n_channels)), features_only=True
    )["params"]
    h_params = head.init(k2, jnp.zeros((1, cfg.embed_dim)))["params"]
    student = {"backbone": b_params, "head": h_params}
    teacher = jax.tree.map(jnp.copy, student)

    niter = 8
    lr = cosine_scheduler(5e-4, 1e-6, cfg.epochs, niter)
    wd = cosine_scheduler(0.04, 0.4, cfg.epochs, niter)
    mom = cosine_scheduler(0.996, 1.0, cfg.epochs, niter)
    temps = teacher_temp_schedule(0.04, 0.04, 0, cfg.epochs)
    tx = make_scheduled_optimizer("adamw", lr, wd, params_mask_source=student, clip_grad=3.0)
    state = DinoTrainState(
        step=jnp.zeros([], jnp.int32), student_params=student, teacher_params=teacher,
        opt_state=tx.init(student), center=jnp.zeros((1, cfg.out_dim), jnp.float32),
    )
    step = make_dino_step(
        backbone_apply=lambda p, x: backbone.apply(p, x, features_only=True),
        head_apply=lambda p, f: head.apply(p, f),
        tx=tx,
        lr_schedule=jnp.asarray(lr, jnp.float32),
        wd_schedule=jnp.asarray(wd, jnp.float32),
        momentum_schedule=jnp.asarray(mom, jnp.float32),
        teacher_temp_by_epoch=jnp.asarray(temps, jnp.float32),
        niter_per_ep=niter,
        global_length=cfg.global_length,
        local_length=cfg.local_length,
    )

    def run(state, n, key):
        t0 = time.perf_counter()
        for i in range(n):
            key, sub = jax.random.split(key)
            state, metrics = step(state, eeg, sub)
        _ = float(metrics["loss"])
        return time.perf_counter() - t0, state

    for _ in range(3):  # compile + warm
        state, metrics = step(state, eeg, jax.random.key(9))
    _ = float(metrics["loss"])

    # difference two step counts so the fixed float() sync round trip
    # cancels (CLAUDE.md tunnel timing rule; bench.py does the same)
    d2, state = run(state, 2, jax.random.key(1))
    d12, state = run(state, 12, jax.random.key(2))
    per_step = (d12 - d2) / 10
    print(f"dino step: {per_step*1e3:.2f} ms at B={B} -> {B/per_step:.0f} windows/s "
          f"(loss {float(metrics['loss']):.4f})")
    return B / per_step


if __name__ == "__main__":
    print(f"devices: {jax.devices()}")
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1024)
