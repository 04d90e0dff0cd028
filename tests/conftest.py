"""Test config: force CPU with 8 virtual devices so mesh/collective paths run
without TPU hardware (SURVEY.md §4 — the reference had no tests at all; we
test distributed code via XLA's host-platform device emulation)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # hard override: tests never run on TPU
# keep cerebra/__init__'s TPU-tunnel cache hook out of the suite; the tests
# get their OWN cache below
os.environ.setdefault("CEREBRA_NO_COMPILE_CACHE", "1")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The environment's sitecustomize force-registers a remote TPU ("axon") PJRT
# backend and overrides JAX_PLATFORMS; pin the config back to CPU so the test
# suite is hermetic and fast.
jax.config.update("jax_platforms", "cpu")

# The suite gets its OWN persistent compile cache, separate from the TPU
# tunnel cache cerebra/__init__ configures: repeat runs skip the ~2 min of
# CPU test compiles (round-2's 5:08 suite was silently riding the shared
# cache; a fully cold run is ~5:45). Host-fingerprinted like the main cache
# so an XLA:CPU AOT executable never crosses machines (SIGILL risk).
if jax.config.jax_compilation_cache_dir is None:
    import sys as _sys

    _sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from cerebra import _host_fingerprint

    _cache = os.path.expanduser("~/.cache/cerebra/test_cache-" + _host_fingerprint())
    # set as ENV (not only jax.config) so the many subprocess-spawning tests
    # (multi-process training, CLI smokes, launcher) inherit the cache too —
    # their compiles are most of the suite's cold time
    os.environ["JAX_COMPILATION_CACHE_DIR"] = _cache
    jax.config.update("jax_compilation_cache_dir", _cache)
    # cache every compile ≥0.5 s (the default 1 s threshold skips most of
    # the mid-sized test jits that dominate the suite)
    os.environ["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"] = "0.5"
    os.environ["JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES"] = "0"
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
