"""cerebra.cli.launch — the torchrun/mp.spawn equivalent actually spawns a
working distributed world (EEG-BarlowNetworks/train.py:53-78 surface)."""

import os
import sys
import textwrap

import pytest

WORKER = textwrap.dedent(
    """
    import os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax
    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, os.environ["CEREBRA_REPO"])
    from cerebra.cli.common import init_distributed
    init_distributed()
    print(f"WORLD {jax.process_count()} RANK {jax.process_index()} "
          f"DEVICES {len(jax.devices())}")
    """
)


@pytest.mark.slow  # spawns sleeping child processes; ~6 s of wall waits
def test_launch_kills_survivors_on_first_failure(tmp_path):
    """torchrun contract: one rank dying must not leave the others hung in
    the rendezvous — the launcher terminates them and propagates the code."""
    import time

    script = tmp_path / "w.py"
    script.write_text(
        "import os, sys, time\n"
        "if os.environ['RANK'] == '1':\n"
        "    sys.exit(3)\n"
        "time.sleep(300)\n"
    )
    from cerebra.cli.launch import main

    t0 = time.monotonic()
    rc = main(["--nproc", "2", "--", sys.executable, str(script)])
    assert rc == 3
    assert time.monotonic() - t0 < 30  # did not wait out the sleeping rank


@pytest.mark.slow
def test_launch_spawns_distributed_world(tmp_path, capsys):
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    os.environ["CEREBRA_REPO"] = os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))
    )
    from cerebra.cli.launch import main

    rc = main(["--nproc", "2", "--", sys.executable, str(script)])
    assert rc == 0
    out = capsys.readouterr().out
    assert "[rank0] WORLD 2 RANK 0 DEVICES 4" in out
    assert "[rank1] WORLD 2 RANK 1 DEVICES 4" in out
