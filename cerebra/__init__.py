"""cerebra — a TPU-native (JAX/XLA/Pallas/pjit) EEG→vision learning framework.

Re-designed from scratch with the capabilities of the reference research
codebase Vi-Sri/CerebralSignalNetworks (EEG→visual-semantics distillation and
retrieval), but built TPU-first:

- compute path: pure-functional JAX, `jax.jit` everywhere, bf16 matmuls on
  the MXU, `lax.scan` recurrence, Pallas kernels for hot ops;
- scaling: `jax.sharding.Mesh` + NamedSharding/shard_map with XLA collectives
  (psum/all_gather) over ICI — replacing the reference's torch.distributed
  (gloo/NCCL) DDP;
- retrieval: exact L2 top-k as fused on-device matmuls — replacing faiss
  IndexFlatL2 (reference utils/Utilities.py:45-55);
- data: the reference's `.pth` corpus contract (ConvertToPth.py:170-201)
  preserved bit-for-bit, materialized once into device arrays instead of
  per-sample Python loops.

Subpackages:
  data     — .pth schema, corpora (Spampinato/Perils), synthetic EEG, ingest
  signal   — IIR/FFT filters, filtfilt, mel spectrograms, normalization
  models   — reconstructed LSTM `Model`, Conformer, ViT, DINO head, AEs, Barlow
  losses   — DINO, feature-distribution, KD, cosine, Barlow-Twins
  train    — optimizers, schedules, EMA, train steps, checkpoints
  parallel — mesh + named collectives
  eval     — retrieval metrics, score artifacts, channel discovery
  utils    — logging, config, rng
"""

__version__ = "0.1.0"
