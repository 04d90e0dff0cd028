"""Test config: force CPU with 8 virtual devices so mesh/collective paths run
without TPU hardware (SURVEY.md §4 — the reference had no tests at all; we
test distributed code via XLA's host-platform device emulation)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # hard override: tests never run on TPU
# hermetic + fast: the persistent compile cache (cerebra/__init__) targets
# the tunneled TPU's 3-min/signature round trip; on CPU test compiles the
# serialize+write per jit only costs time (measured ~+40 s on the suite)
os.environ.setdefault("CEREBRA_NO_COMPILE_CACHE", "1")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The environment's sitecustomize force-registers a remote TPU ("axon") PJRT
# backend and overrides JAX_PLATFORMS; pin the config back to CPU so the test
# suite is hermetic and fast.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
