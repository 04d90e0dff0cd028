#!/bin/bash
# Round-5 TPU measurement sequence — the round-4 evidence deficit plus
# round-5 additions. Run SOLO on the chip the moment the tunnel is alive.
# Logs land in /tmp/round5_bench/. Budget: first compiles go through the
# remote-compile tunnel (60-300 s per new jit signature).
#
# Order matters (CLAUDE.md discipline): TPU-SMOKE every kernel-touched CLI
# surface FIRST (interpret-mode tests cannot see Mosaic lowering
# rejections), then measure.
set -u
OUT=${1:-/tmp/round5_bench}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

run() {
  name=$1; shift
  echo "=== $name: $* ==="
  { time timeout "${STEP_TIMEOUT:-2400}" "$@"; } >"$OUT/$name.log" 2>&1
  rc=$?
  echo "--- rc=$rc; tail:"
  tail -5 "$OUT/$name.log"
}

# 0) SMOKES of kernel-touched surfaces (round-4 fused ViT half-blocks,
#    fused conformer patch embed, round-5 chunk padding) at tiny shapes
run smoke_main_dino_fused python -m cerebra.cli.main_dino --synthetic --epochs 1 \
    --arch vit_tiny --patch_size 16 --global_size 64 --local_size 32 \
    --out_dim 64 --batch_size_per_gpu 8 --drop_path_rate 0 \
    --use_fused_mlp true --use_fused_attn true --use_bf16 true \
    --log_dir "$OUT/smoke_fused"
run smoke_conformer python -m cerebra.cli.conformer_train --synthetic --n_epochs 2 \
    --batch_size 16 --log_dir "$OUT/smoke_conformer"
run smoke_discovery_ragged python -m cerebra.cli.discover_channels --synthetic \
    --max_channels 2 --channel_chunk 3 --synthetic_channels 8 \
    --synthetic_classes 2 --synthetic_per_class 6 --synthetic_samples 32 \
    --log_dir "$OUT/smoke_discovery"

# 1) headline (BENCH_r05 candidate) — confirms >=163k w/s driver-visible
run headline python bench.py

# 2) ViT roofline attribution (decides the fused-block question)
run vitroof python -m benchmarks.kernel_lab vitroof
run vitmlp python -m benchmarks.kernel_lab vitmlp
run vitattn python -m benchmarks.kernel_lab vitattn

# 3) fused half-block variants at recipe level (ship/reject vs 84.8 w/s):
#    args = batch flash remat fused_mlp fused_attn
run main_dino_b8 python -m benchmarks.pipeline_bench main_dino 8
run main_dino_fusedmlp python -m benchmarks.pipeline_bench main_dino 8 0 0 1
run main_dino_fusedattn python -m benchmarks.pipeline_bench main_dino 8 0 0 0 1
run main_dino_fusedblock python -m benchmarks.pipeline_bench main_dino 8 0 0 1 1

# 4) conformer: fused patch embed, parity batch + throughput batches
run conformer_b72 python -m benchmarks.pipeline_bench conformer 72
run conformer_b288 python -m benchmarks.pipeline_bench conformer 288
run conformer_b576 python -m benchmarks.pipeline_bench conformer 576

# 5) barlow per-chip batch scaling toward the reference's GLOBAL default
#    2048 (= 256/chip on v5e-8; train.py:130-131 divides by world_size)
run barlow_b256 python -m benchmarks.pipeline_bench barlow 256
run barlow_b512 python -m benchmarks.pipeline_bench barlow 512

# 6) full-scale channel discovery + large-gallery retrieval (the
#    "TPU wins the reference's worst loop" headline demo)
run discovery_spampinato python benchmarks/bench_channel_discovery.py spampinato
run retrieval_large python benchmarks/bench_retrieval.py large

# 7) LSTM backward position re-check (roofline ledger continuity)
run bwdstack python -m benchmarks.kernel_lab bwdstack

echo "ALL DONE — logs in $OUT"
