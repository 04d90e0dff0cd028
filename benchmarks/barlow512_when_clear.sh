#!/bin/bash
# Barlow B=512 (nested remat, 11.8 GiB by XLA memory_analysis) — run when
# the tunnel chip's usable HBM window reopens. During round 5 the window
# shrank from >=13 GiB to ~7-8 GiB mid-session (shared chip / leaked
# buffers from OOM-killed clients), blocking this one measurement; the
# program itself fits a clean 16 GB chip (BENCH_AUX "Barlow ResNet remat
# lever"). Probe first, run only on a clear window, SOLO.
set -u
cd "$(dirname "$0")/.."
python - <<'PY'
import jax, jax.numpy as jnp, sys
try:
    x = jnp.zeros((int(13 * 2**30 / 4),), jnp.float32) + 1
    float(x[0]); del x
except Exception:
    sys.exit("HBM window still closed (<13 GiB usable) - try later")
print("window open (>=13 GiB)")
PY
[ $? -eq 0 ] && timeout 2400 python -m benchmarks.pipeline_bench barlow 512 1
