"""ctypes binding for the native C++ brute-force L2 top-k (native/topk_l2.cpp)
— the CPU parity reference for the on-device retrieval kernel (SURVEY.md
§2.8.1: the reference's only native dependency was faiss IndexFlatL2).

The shared library is built on demand with g++ and cached under
native/build/. `available()` reports whether a toolchain is present.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..", "native")
_SRC = os.path.abspath(os.path.join(_NATIVE_DIR, "topk_l2.cpp"))
_BUILD_DIR = os.path.abspath(os.path.join(_NATIVE_DIR, "build"))
_LIB = os.path.join(_BUILD_DIR, "libtopk_l2.so")

_lib: Optional[ctypes.CDLL] = None


def _build() -> str:
    os.makedirs(_BUILD_DIR, exist_ok=True)
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        "-pthread", _SRC, "-o", _LIB,
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    return _LIB


def _load() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
        _build()
    lib = ctypes.CDLL(_LIB)
    lib.topk_l2.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int32,
    ]
    lib.topk_l2.restype = None
    _lib = lib
    return lib


def available() -> bool:
    try:
        _load()
        return True
    except Exception:
        return False


def topk_l2_native(
    gallery: np.ndarray, query: np.ndarray, k: int, n_threads: int = 0
) -> Tuple[np.ndarray, np.ndarray]:
    """Exact squared-L2 k-NN on the host (faiss IndexFlatL2 semantics)."""
    lib = _load()
    gallery = np.ascontiguousarray(gallery.reshape(len(gallery), -1), dtype=np.float32)
    query = np.ascontiguousarray(query.reshape(len(query), -1), dtype=np.float32)
    ng, dim = gallery.shape
    nq = query.shape[0]
    k = min(k, ng)
    out_dist = np.empty((nq, k), dtype=np.float32)
    out_idx = np.empty((nq, k), dtype=np.int64)
    lib.topk_l2(
        gallery.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        query.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ng, nq, dim, k,
        out_dist.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out_idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        n_threads,
    )
    return out_dist, out_idx
