"""ctypes bindings + lazy build of the native SDPA parser."""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO_PATH = os.path.join(_HERE, "libsdpa_parser.so")
_SRC = os.path.join(_HERE, "sdpa_parser.cpp")
_LIB = None
_BUILD_FAILED = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
             _SRC, "-o", _SO_PATH],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _BUILD_FAILED
    if _LIB is not None:
        return _LIB
    if _BUILD_FAILED:
        return None
    if not os.path.exists(_SO_PATH) or (
        os.path.exists(_SRC)
        and os.path.getmtime(_SRC) > os.path.getmtime(_SO_PATH)
    ):
        if not _build():
            _BUILD_FAILED = True
            return None
    lib = ctypes.CDLL(_SO_PATH)
    lib.sdpa_open.restype = ctypes.c_void_p
    lib.sdpa_open.argtypes = [ctypes.c_char_p]
    lib.sdpa_error.restype = ctypes.c_char_p
    lib.sdpa_error.argtypes = [ctypes.c_void_p]
    lib.sdpa_counts.argtypes = [ctypes.c_void_p] + [
        ctypes.POINTER(ctypes.c_int64)] * 4
    lib.sdpa_dims.argtypes = [ctypes.c_void_p,
                              np.ctypeslib.ndpointer(np.int64)]
    lib.sdpa_rhs.argtypes = [ctypes.c_void_p,
                             np.ctypeslib.ndpointer(np.float64)]
    lib.sdpa_entries.argtypes = [
        ctypes.c_void_p,
        np.ctypeslib.ndpointer(np.int32), np.ctypeslib.ndpointer(np.int32),
        np.ctypeslib.ndpointer(np.int32), np.ctypeslib.ndpointer(np.int32),
        np.ctypeslib.ndpointer(np.float64),
    ]
    lib.sdpa_close.argtypes = [ctypes.c_void_p]
    _LIB = lib
    return _LIB


def parse_raw(path: str):
    """Returns (dims, n_lp, b, cid, blk, row, col, val) or None if the
    native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    h = lib.sdpa_open(path.encode())
    try:
        err = lib.sdpa_error(h)
        if err:
            raise ValueError(f"native SDPA parse failed: {err.decode()}")
        m = ctypes.c_int64()
        nb = ctypes.c_int64()
        nlp = ctypes.c_int64()
        nnz = ctypes.c_int64()
        lib.sdpa_counts(h, ctypes.byref(m), ctypes.byref(nb),
                        ctypes.byref(nlp), ctypes.byref(nnz))
        dims = np.zeros(nb.value, np.int64)
        if nb.value:
            lib.sdpa_dims(h, dims)
        b = np.zeros(m.value, np.float64)
        if m.value:
            lib.sdpa_rhs(h, b)
        n = nnz.value
        cid = np.zeros(n, np.int32)
        blk = np.zeros(n, np.int32)
        row = np.zeros(n, np.int32)
        col = np.zeros(n, np.int32)
        val = np.zeros(n, np.float64)
        if n:
            lib.sdpa_entries(h, cid, blk, row, col, val)
        return dims, int(nlp.value), b, cid, blk, row, col, val
    finally:
        lib.sdpa_close(h)
