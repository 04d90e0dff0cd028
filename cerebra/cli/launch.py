"""Multi-process launcher — the torchrun / torch.multiprocessing.spawn
equivalent (EEG-BarlowNetworks/train.py:53-78 spawns one worker per GPU and
wires MASTER_ADDR/RANK/WORLD_SIZE; utils/utils.py:467-503 reads them).

Spawns N copies of a cerebra CLI with the env:// convention this framework's
`init_distributed` consumes (JAX_COORDINATOR_ADDRESS / RANK / WORLD_SIZE),
streams each rank's output with a rank prefix, and propagates the first
failure.

    python -m cerebra.cli.launch --nproc 2 -- \
        python -m cerebra.cli.lstm_distill_from_dinov2_train --synthetic ...

Single-machine multi-process CPU testing works the same way with
JAX_PLATFORMS=cpu and XLA_FLAGS=--xla_force_host_platform_device_count=K
per process (see tests/test_multiprocess_training.py).
"""

from __future__ import annotations

import argparse
import os
import socket
import subprocess
import sys
import threading


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _pump(rank: int, proc: subprocess.Popen) -> None:
    for line in proc.stdout:  # type: ignore[union-attr]
        sys.stdout.write(f"[rank{rank}] {line}")
        sys.stdout.flush()


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        "cerebra.launch", description="spawn N distributed worker processes"
    )
    parser.add_argument("--nproc", type=int, default=1)
    parser.add_argument(
        "--coordinator", type=str, default="",
        help="host:port rendezvous (default: localhost:<free port>)",
    )
    parser.add_argument("cmd", nargs=argparse.REMAINDER,
                        help="worker command after `--`")
    FLAGS = parser.parse_args(argv)
    cmd = FLAGS.cmd
    if cmd and cmd[0] == "--":
        cmd = cmd[1:]
    if not cmd:
        parser.error("no worker command given (use: launch --nproc N -- <cmd>)")
    coordinator = FLAGS.coordinator or f"localhost:{_free_port()}"

    procs, pumps = [], []
    for rank in range(FLAGS.nproc):
        env = {
            **os.environ,
            "JAX_COORDINATOR_ADDRESS": coordinator,
            "WORLD_SIZE": str(FLAGS.nproc),
            "RANK": str(rank),
        }
        p = subprocess.Popen(
            cmd, env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        t = threading.Thread(target=_pump, args=(rank, p), daemon=True)
        t.start()
        procs.append(p)
        pumps.append(t)
    # poll-and-terminate (the torchrun contract): the first nonzero exit
    # kills the surviving ranks — otherwise they hang forever inside the
    # distributed rendezvous / next collective waiting for the dead rank
    import time

    rc = 0
    live = dict(enumerate(procs))
    while live:
        for rank in list(live):
            code = live[rank].poll()
            if code is None:
                continue
            del live[rank]
            if code != 0:
                print(f"[launch] rank {rank} exited with {code}; "
                      f"terminating remaining ranks", file=sys.stderr)
                rc = rc or code
                for p in live.values():
                    p.terminate()
                for p in live.values():
                    try:
                        p.wait(timeout=10)
                    except subprocess.TimeoutExpired:
                        p.kill()
                live = {}
                break
        time.sleep(0.1)
    for t in pumps:
        t.join(timeout=5)
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
