"""Multi-host comm-backend init, actually exercised.

The reference's init_distributed_mode (utils/utils.py:467-503) wires a real
torch.distributed process group from RANK/WORLD_SIZE (env://) or SLURM vars.
Our `cerebra.cli.common.init_distributed` does the same for jax.distributed.
This test launches TWO real OS processes, each with 2 virtual CPU devices,
initializes the distributed runtime through our entry point, builds a global
4-device mesh spanning both processes, and runs a jitted cross-process
reduction — proving the backend carries collectives, not just handshakes.

Marked slow: two cold python+jax starts plus a Gloo rendezvous (~40 s).
"""

import os
import socket
import subprocess
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

    init_distributed()  # RANK/WORLD_SIZE/JAX_COORDINATOR_ADDRESS from env
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 4, jax.devices()
    assert len(jax.local_devices()) == 2

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    mesh = Mesh(np.array(jax.devices()).reshape(4), ("data",))
    sh = NamedSharding(mesh, P("data"))
    # per-process local rows -> one global sharded array (the multi-host
    # ingest pattern: each host contributes only its addressable shards)
    local = np.full((2, 3), jax.process_index() + 1, np.float32)
    ga = jax.make_array_from_process_local_data(sh, local, global_shape=(4, 3))
    total = jax.jit(lambda a: jnp.sum(a), out_shardings=NamedSharding(mesh, P()))(ga)
    # rows: two of 1s (proc 0) + two of 2s (proc 1), 3 cols -> 6 + 12
    assert float(total) == 18.0, float(total)
    print(f"WORKER_OK rank={jax.process_index()} total={float(total)}")
    """
)


@pytest.mark.slow
def test_two_process_init_and_global_collective(tmp_path):
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    env_base = {
        **os.environ,
        "JAX_COORDINATOR_ADDRESS": f"localhost:{port}",
        "WORLD_SIZE": "2",
        "CEREBRA_REPO": os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    }
    procs = [
        subprocess.Popen(
            [sys.executable, str(script)],
            env={**env_base, "RANK": str(rank)},
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for rank in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=240)
        outs.append(out)
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out}"
        assert f"WORKER_OK rank={rank} total=18.0" in out, out
