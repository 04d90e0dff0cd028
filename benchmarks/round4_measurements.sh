#!/bin/bash
# Round-4 TPU measurement sequence. Run SOLO on the chip (each step runs
# alone; the script is sequential by construction). Logs land in
# /tmp/round4_bench/. Budget: first compiles go through the remote-compile
# tunnel (60-300 s per new jit signature).
set -u
OUT=${1:-/tmp/round4_bench}
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

# 0) headline (BENCH_r04 candidate) — confirms >=163k w/s post-round-3
run headline python bench.py

# 1) ViT roofline attribution (decides the fused-block question)
run vitroof python -m benchmarks.kernel_lab vitroof
run vitmlp python -m benchmarks.kernel_lab vitmlp
run vitattn python -m benchmarks.kernel_lab vitattn

# 2) conformer: fused patch embed, parity batch + throughput batches
run conformer_b72 python -m benchmarks.pipeline_bench conformer 72
run conformer_b288 python -m benchmarks.pipeline_bench conformer 288
run conformer_b576 python -m benchmarks.pipeline_bench conformer 576

# 3) barlow per-chip batch scaling toward the reference's GLOBAL default
#    2048 (= 256/chip on v5e-8; train.py:130-131 divides by world_size)
run barlow_b256 python -m benchmarks.pipeline_bench barlow 256
run barlow_b512 python -m benchmarks.pipeline_bench barlow 512

# 4) full-scale channel discovery + large-gallery retrieval
run discovery_spampinato python benchmarks/bench_channel_discovery.py spampinato
run retrieval_large python benchmarks/bench_retrieval.py large

# 5) TPU smoke of the conformer CLI (compute path changed: fused embed)
run conformer_cli python -m cerebra.cli.conformer_train --synthetic --n_epochs 2 \
    --batch_size 16 --log_dir /tmp/round4_bench/conformer_cli

# 6) main_dino reference-scale sanity (post ViT-importer refactor; no
#    compute-path change expected — confirms 84.8 w/s baseline stands)
run main_dino_b8 python -m benchmarks.pipeline_bench main_dino 8
# 7) fused half-block variants (ship/reject at recipe level):
#    args = batch flash remat fused_mlp fused_attn
run main_dino_fusedmlp python -m benchmarks.pipeline_bench main_dino 8 0 0 1
run main_dino_fusedattn python -m benchmarks.pipeline_bench main_dino 8 0 0 0 1
run main_dino_fusedblock python -m benchmarks.pipeline_bench main_dino 8 0 0 1 1

echo "ALL DONE — logs in $OUT"
