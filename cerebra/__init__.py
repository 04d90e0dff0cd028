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


def _host_fingerprint() -> str:
    """Short hash of the host CPU's feature flags.

    XLA:CPU AOT executables bake in the compiling machine's ISA extensions;
    loading them on a host with different features can SIGILL (the loader
    only warns).  Keying the default cache dir on the flags keeps a cache
    written on one machine from being replayed on another."""
    import hashlib

    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return hashlib.sha1(line.encode()).hexdigest()[:10]
    except OSError:
        pass
    import platform

    return hashlib.sha1(platform.processor().encode()).hexdigest()[:10]


def _enable_persistent_compile_cache() -> None:
    """Default-on persistent XLA compilation cache.

    On the tunneled TPU backend a compile round trip costs ~3 minutes PER
    JIT SIGNATURE regardless of program size (measured: trivial matmul
    cache-miss 180 s vs cache-hit 10 s); without a cache every process
    repays it. Opt out with CEREBRA_NO_COMPILE_CACHE=1 or by setting
    JAX_COMPILATION_CACHE_DIR yourself."""
    import os

    if os.environ.get("CEREBRA_NO_COMPILE_CACHE"):
        return
    try:
        import jax

        if jax.config.jax_compilation_cache_dir is None:
            cache_dir = os.environ.get(
                "JAX_COMPILATION_CACHE_DIR",
                os.path.expanduser("~/.cache/cerebra/jax_cache-" + _host_fingerprint()),
            )
            os.makedirs(cache_dir, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            # the default 1 s threshold skips small executables, but on the
            # tunneled backend the compile ROUND TRIP (not attributed as
            # compile time) is minutes even for trivial programs — cache all
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
            jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass


def _honor_cpu_platform_env() -> None:
    """Restore `JAX_PLATFORMS=cpu` semantics under the axon site plugin.

    The environment's sitecustomize registers the tunneled TPU backend at
    interpreter start and overwrites the jax_platforms CONFIG to
    "axon,cpu" (axon/register/pjrt.py), so the standard env var alone no
    longer selects CPU — any CLI that touches jnp before pinning the config
    initializes the remote backend, which HANGS when the tunnel is down
    (round-4 regression found on cli.discover_channels; CLAUDE.md "two
    runtimes" rule). Re-pin at package import — every CLI imports cerebra
    before its first jnp call — but ONLY when the env asks for cpu-first,
    leaving the plugin's own TPU selection untouched otherwise."""
    import os

    plat = os.environ.get("JAX_PLATFORMS", "")
    if not plat or plat.split(",")[0].strip().lower() != "cpu":
        return
    try:
        import jax

        jax.config.update("jax_platforms", plat)
    except Exception:
        pass


_enable_persistent_compile_cache()
_honor_cpu_platform_env()
