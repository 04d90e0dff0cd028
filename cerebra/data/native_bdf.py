"""ctypes binding for the native C++ BDF reader (native/bdf_reader.cpp) —
the data-loader counterpart of the pure-numpy `cerebra.data.bdf.read_raw_bdf`
(reference ingest: ConvertToPth.py:69 via MNE). Same `BDFData` contract;
decode is multithreaded in C++. Built on demand with g++ and cached under
native/build/ (the same pattern as cerebra.eval.native_topk).
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

from cerebra.data.bdf import BDFData
from cerebra.utils.native_build import build_and_load

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..", "native")
_SRC = os.path.abspath(os.path.join(_NATIVE_DIR, "bdf_reader.cpp"))
_BUILD_DIR = os.path.abspath(os.path.join(_NATIVE_DIR, "build"))
_LIB = os.path.join(_BUILD_DIR, "libbdf_reader.so")

_lib: Optional[ctypes.CDLL] = None


def _load() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    lib = build_and_load(_SRC, _LIB)
    lib.bdf_query.restype = ctypes.c_int
    lib.bdf_query.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_long),
        ctypes.POINTER(ctypes.c_double),
    ]
    lib.bdf_read.restype = ctypes.c_int
    lib.bdf_read.argtypes = [
        ctypes.c_char_p,
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        ctypes.c_char_p,
    ]
    _lib = lib
    return lib


def available() -> bool:
    try:
        _load()
        return True
    except Exception:
        return False


def read_raw_bdf(path: str) -> BDFData:
    """Native read; identical contract to cerebra.data.bdf.read_raw_bdf."""
    lib = _load()
    n_ch = ctypes.c_int()
    n_samp = ctypes.c_long()
    rate = ctypes.c_double()
    rc = lib.bdf_query(path.encode(), ctypes.byref(n_ch), ctypes.byref(n_samp),
                       ctypes.byref(rate))
    if rc != 0:
        raise ValueError(f"bdf_query failed (rc={rc}) for {path!r}")
    C, T = n_ch.value, n_samp.value
    signals = np.empty((C, T), dtype=np.float32)
    status = np.zeros((T,), dtype=np.int32)
    labels_buf = ctypes.create_string_buffer(17 * C)
    rc = lib.bdf_read(path.encode(), signals, status, labels_buf)
    if rc != 0:
        raise ValueError(f"bdf_read failed (rc={rc}) for {path!r}")
    labels = [
        labels_buf.raw[17 * i : 17 * i + 16].split(b"\0", 1)[0].decode("ascii", errors="replace").strip()
        for i in range(C)
    ]
    return BDFData(
        signals=signals, channel_names=labels, sample_rate=rate.value, status=status
    )
