#!/bin/bash
# Round-5 follow-up TPU sequence (after round5_measurements.sh): re-drive the
# two OOM fixes on hardware and finish the fused-attn ship/reject decision.
# Run SOLO on the chip. Logs land in /tmp/round5_followup/.
set -u
OUT=${1:-/tmp/round5_followup}
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

# 1) fused-attn smoke after the 64 MiB scoped-vmem fix (tiny shapes)
run smoke_fusedattn python -m cerebra.cli.main_dino --synthetic --epochs 1 \
    --arch vit_tiny --patch_size 16 --global_size 64 --local_size 32 \
    --out_dim 64 --batch_size_per_gpu 8 --drop_path_rate 0 \
    --use_fused_attn true --use_bf16 true --log_dir "$OUT/smoke_fusedattn_dir"

# 2) fused-attn + fused-block at recipe scale (vs 82.2 baseline / 93.8 fused-mlp)
run main_dino_fusedattn python -m benchmarks.pipeline_bench main_dino 8 0 0 0 1
run main_dino_fusedblock python -m benchmarks.pipeline_bench main_dino 8 0 0 1 1

# 3) full Spampinato greedy sweep with the streamed-chunk path (no resident D)
run discovery_spampinato python benchmarks/bench_channel_discovery.py spampinato

echo "ALL DONE — logs in $OUT"
