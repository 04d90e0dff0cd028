"""Shared on-demand g++ build-and-cache helper for the native/ C++ sources.

One implementation for what cerebra.data.native_bdf and
cerebra.eval.native_topk previously each copied: compile `src` to a .so
under native/build/ when missing or stale, then dlopen it.

Concurrency-safe: `cerebra.cli.launch` spawns N ranks of the same CLI, and
N simultaneous `g++ ... -o lib.so` writes to one path can hand a rank a
truncated ELF whose mtime then looks fresh forever. The compile therefore
goes to a per-process temp name followed by an atomic os.replace(); a rank
that loses the race simply replaces the file with an identical library.
"""

from __future__ import annotations

import ctypes
import os
import subprocess


def build_and_load(src: str, lib_path: str) -> ctypes.CDLL:
    """Compile `src` → `lib_path` (if missing/stale) and dlopen it."""
    build_dir = os.path.dirname(lib_path)
    os.makedirs(build_dir, exist_ok=True)
    if not os.path.exists(lib_path) or os.path.getmtime(lib_path) < os.path.getmtime(src):
        tmp = f"{lib_path}.tmp.{os.getpid()}"
        cmd = [
            "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
            "-pthread", src, "-o", tmp,
        ]
        try:
            subprocess.run(cmd, check=True, capture_output=True)
            os.replace(tmp, lib_path)  # atomic: no reader ever sees a partial .so
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)
    return ctypes.CDLL(lib_path)
