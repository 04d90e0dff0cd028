#!/bin/bash
# Barlow B=512 (nested remat, 11.8 GiB by XLA memory_analysis) — run SOLO.
# The round-5 OOMs were the EAGER corpus-spectrogram chain's ~13 GB
# transient peak at n=2048 (fixed: chunked jitted spectrogram in
# barlow_recipe), not a degraded chip; the single-buffer probe below
# verifies ~13 GiB is allocatable before committing to the long run.
set -u
cd "$(dirname "$0")/.."
python - <<'PY'
import jax, jax.numpy as jnp, sys
try:
    x = jnp.ones((int(13 * 2**30 / 4),), jnp.float32)  # ONE 13 GiB buffer
    float(x[0]); del x
except Exception:
    sys.exit("HBM window closed (<13 GiB usable in one buffer) - try later")
print("window open (>=13 GiB)")
PY
[ $? -eq 0 ] && timeout 2400 python -m benchmarks.pipeline_bench barlow 512 1
