"""Driver-contract tests for __graft_entry__.py.

The driver compile-checks `entry()` single-chip and runs `dryrun_multichip(8)`
on a host with (possibly) one real chip; the entry must therefore acquire an
8-device virtual CPU mesh itself when hardware has fewer devices (VERDICT
round 1, item 1).  These tests exercise both paths: the in-process impl on
this suite's 8 virtual CPU devices, and the subprocess re-exec fallback.
"""

import subprocess
import sys
import os

import jax
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __graft_entry__ as graft  # noqa: E402


def test_entry_compiles_single_device():
    fn, args = graft.entry()
    feats, cls = jax.jit(fn)(*args)
    assert feats.shape == (16, 384)
    assert cls.shape[0] == 16


@pytest.mark.slow  # the driver re-runs dryrun_multichip(8) every round;
# fast-suite meshed coverage lives in tests/test_parallel.py
def test_dryrun_multichip_in_process():
    # conftest forces 8 virtual CPU devices, so this takes the direct path.
    assert jax.device_count() >= 8
    graft.dryrun_multichip(8)


@pytest.mark.slow
def test_dryrun_multichip_subprocess_fallback():
    """Simulate the driver's world: a fresh interpreter with NO forced device
    count (so jax sees few devices) calling dryrun_multichip(8) — the entry
    must re-exec itself onto 8 virtual CPU devices and succeed."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env["JAX_PLATFORMS"] = "cpu"  # 1 CPU device in the child
    code = (
        "import jax; jax.config.update('jax_platforms','cpu'); "
        "import __graft_entry__ as g; g.dryrun_multichip(8); print('FALLBACK_OK')"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code], env=env, cwd=repo,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stdout
    assert "dryrun_multichip OK" in proc.stdout
    assert "FALLBACK_OK" in proc.stdout


@pytest.mark.slow  # 35 s on the 1-vCPU host; the driver exercises the
# default (4, 2) dryrun every round and the slow sweep covers (8,)/(4, 2)
def test_dryrun_mesh_shape_2x4():
    """Mesh-shape generality (VERDICT round 3 #8): the full meshed training
    step must hold on a (2 data × 4 model) factorization, not only the
    driver's default (4, 2) — model-axis size 4 changes every TP sharding."""
    graft._dryrun_multichip_impl(8, mesh_shape=(2, 4))


@pytest.mark.slow
@pytest.mark.parametrize("shape", [(8,), (4, 2)])
def test_dryrun_mesh_shape_sweep_8dev(shape):
    graft._dryrun_multichip_impl(8, mesh_shape=shape)


@pytest.mark.slow
@pytest.mark.parametrize("n,shape", [(16, (8, 2)), (32, (16, 2)), (16, (4, 4))])
def test_dryrun_larger_virtual_meshes(n, shape):
    """16/32 virtual devices in a fresh interpreter (the suite's own backend
    is pinned at 8 devices)."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={n}"
    code = (
        "import jax; jax.config.update('jax_platforms','cpu'); "
        f"import __graft_entry__ as g; g._dryrun_multichip_impl({n}, mesh_shape={shape})"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code], env=env, cwd=repo,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, timeout=420,
    )
    assert proc.returncode == 0, proc.stdout
    assert "dryrun_multichip OK" in proc.stdout
