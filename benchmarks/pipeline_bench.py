"""Whole-pipeline throughput on the real TPU for the three round-2
unbenchmarked trainers: main_dino (ViT), barlow_train, conformer_train.

Times the RECIPE epoch path (the whole-epoch lax.scan the CLIs call), not an
isolated step: epoch 0 pays compile, warm epochs are timed via the recipe's
own history["epoch_time_s"] — wall clock between two host syncs, which is
valid on the axon tunnel (each epoch ends in one float() sync of a value
depending on every step).

Run SOLO on the chip:  python -m benchmarks.pipeline_bench [main_dino|barlow|conformer] ...
"""

import sys

import numpy as np

V5E_BF16_PEAK_TFLOPS = 197.0


def _report(name, hist, windows_per_epoch, gf_per_window, cmd):
    warm = hist["epoch_time_s"][1:]
    dt = float(np.median(warm))
    wps = windows_per_epoch / dt
    tflops = wps * gf_per_window / 1e3
    print(
        f"[{name}] {dt*1e3:.1f} ms/epoch ({len(warm)} warm), "
        f"{wps:.1f} windows/s, est {gf_per_window:.1f} GF/window -> "
        f"{tflops:.1f} TFLOP/s (~{100*tflops/V5E_BF16_PEAK_TFLOPS:.1f}% of v5e bf16 peak)"
    )
    print(f"[{name}] repro: {cmd}")
    return wps


def vit_flops(n_tokens, depth=12, d=384):
    """Standard ViT estimate: per block 12·N·d² (qkv/proj/mlp) + 2·N²·d
    (attention), fwd MACs → ×2 FLOPs."""
    return depth * (12 * n_tokens * d * d + 2 * n_tokens * n_tokens * d) * 2


def bench_main_dino(batch=8, flash=0, remat=0, fused_mlp=0, fused_attn=0, dpr10=0, fused_min_seq=0, epochs=4, arch="vit_small", patch=8):
    import jax.numpy as jnp

    from cerebra.train.dino_vit import DinoVitConfig, dino_vit_train

    n = batch * 4  # 4 steps/epoch
    rng = np.random.default_rng(0)
    eeg = rng.normal(size=(n, 460, 128)).astype(np.float32)
    imgs = rng.random(size=(n, 224, 224, 3)).astype(np.float32)
    cfg = DinoVitConfig(
        arch=arch, patch_size=patch, out_dim=65536, epochs=epochs,
        batch_size_per_device=batch, warmup_epochs=0, dtype=jnp.bfloat16,
        use_flash=bool(flash), remat=bool(remat), use_fused_mlp=bool(fused_mlp),
        use_fused_attn=bool(fused_attn),
        # dpr10=0 (drop_path 0.0) keeps continuity with the round-2/3
        # main_dino numbers; dpr10=1 measures the reference-default 0.1
        # (since round 5 the fused kernels stay engaged under drop_path —
        # the per-sample mask rides inside the kernels as the branch scale)
        drop_path_rate=dpr10 / 10.0,
        fused_min_seq=fused_min_seq,
    )
    _, hist = dino_vit_train(eeg, imgs, config=cfg, log_fn=lambda s: None)
    # teacher fwd: 2 globals; student fwd+bwd (×3): 2 globals + 4 locals
    ng = (224 // patch) ** 2 + 1
    nl = (96 // patch) ** 2 + 1
    d = {"vit_tiny": 192, "vit_small": 384, "vit_base": 768}[arch]
    gf = (2 * vit_flops(ng, d=d) + 3 * (2 * vit_flops(ng, d=d) + 4 * vit_flops(nl, d=d))) / 1e9
    return _report(
        "main_dino", hist, 4 * batch, gf,
        f"python -m benchmarks.pipeline_bench main_dino {batch} {int(flash)} {int(remat)} {int(fused_mlp)} {int(fused_attn)} {int(dpr10)} {int(fused_min_seq)}",
    )


def bench_barlow(batch=16, remat=0, epochs=4):
    import jax.numpy as jnp

    from cerebra.train.barlow_recipe import BarlowConfig, barlow_train

    n = batch * 4
    rng = np.random.default_rng(0)
    imgs = rng.random(size=(n, 224, 224, 3)).astype(np.float32)
    eeg = rng.normal(size=(n, 512, 96)).astype(np.float32)
    cfg = BarlowConfig(
        epochs=epochs, batch_size=batch, projector=(8192, 8192, 8192),
        n_mels=224, image_size=224, warmup_epochs=0, dtype=jnp.bfloat16,
        remat=bool(remat),
    )
    _, hist = barlow_train(imgs, eeg, config=cfg, log_fn=lambda s: None)
    # 2 ResNet-50 towers (~4.1 GF fwd @224) + 8192³ projector (~0.3 GF fwd),
    # fwd+bwd ≈ ×3 (remat re-forwards the towers: ≈ ×4 — reported at the
    # nominal ×3 so w/s stays the comparable metric)
    gf = 3 * (2 * 4.1 + 2 * 0.3)
    return _report(
        "barlow", hist, 4 * batch, gf,
        f"python -m benchmarks.pipeline_bench barlow {batch} {int(remat)}",
    )


def bench_conformer(batch=72, epochs=6):
    from cerebra.train.conformer_recipe import (
        ExPConfig,
        conformer_exp_train,
        make_synthetic_bciiv,
    )

    data, labels = make_synthetic_bciiv(seed=0, n_per_class=72)  # 288 trials
    test_x, test_y = data[:32], labels[:32]
    cfg = ExPConfig(n_epochs=epochs, batch_size=batch, eval_every=10**9)
    _, hist = conformer_exp_train(
        data, labels, test_x, test_y, config=cfg, log_fn=lambda s: None
    )
    niter = max(len(data) // cfg.batch_size, 1)
    step_batch = cfg.step_batch
    # conv patch embed (40×(1,25)+(22,1) convs on (1,22,1000)) dominates:
    # ~0.13 GF fwd; 6 transformer blocks d=40 over ~61 tokens ≈ 0.01 GF;
    # fwd+bwd ≈ ×3
    gf = 3 * 0.14
    return _report(
        "conformer", hist, niter * step_batch, gf,
        f"python -m benchmarks.pipeline_bench conformer {batch}",
    )


BENCHES = {"main_dino": bench_main_dino, "barlow": bench_barlow, "conformer": bench_conformer}


if __name__ == "__main__":
    import jax

    print(f"devices: {jax.devices()}", flush=True)
    args = sys.argv[1:]
    if args and args[0] in BENCHES and any(a not in BENCHES for a in args[1:]):
        # one bench with numeric extras: `pipeline_bench main_dino 8 0 0 1 1`
        BENCHES[args[0]](*[int(a) for a in args[1:]])
    else:
        # zero args = all benches at defaults; N bench names = each in turn
        for n in args or list(BENCHES):
            if n not in BENCHES:
                raise SystemExit(f"unknown bench {n!r}; choose from {list(BENCHES)}")
            BENCHES[n]()
