"""ctypes bindings for the native host runtime; auto-builds on first use
and falls back to exact big-int numpy when no toolchain is available."""

from __future__ import annotations

import ctypes
import os

import numpy as np

HERE = os.path.dirname(__file__)
LIB_PATH = os.path.join(HERE, "libhostcrypto.so")

_lib = None
_tried = False


def get_lib():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(LIB_PATH):
        from .build import build

        build(verbose=False)
    if os.path.exists(LIB_PATH):
        lib = ctypes.CDLL(LIB_PATH)
        u64p = ctypes.POINTER(ctypes.c_uint64)
        u32p = ctypes.POINTER(ctypes.c_uint32)
        lib.ntt_forward_u64.argtypes = [
            u64p, u64p, ctypes.c_uint64, ctypes.c_int
        ]
        lib.ntt_inverse_u64.argtypes = [
            u64p, u64p, ctypes.c_uint64, ctypes.c_uint64, ctypes.c_int
        ]
        lib.reduce_residues_u64.argtypes = [
            u64p, ctypes.c_long, u32p, ctypes.c_long, u32p
        ]
        _lib = lib
    return _lib


def _u64p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64))


def ntt_forward(x: np.ndarray, tw: np.ndarray, t: int) -> np.ndarray | None:
    """In-place-capable forward negacyclic NTT mod t (t < 2**63).
    Returns None if the native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    logn = int(np.log2(len(x)))
    buf = np.ascontiguousarray(x, dtype=np.uint64)
    lib.ntt_forward_u64(_u64p(buf), _u64p(np.ascontiguousarray(tw)), t, logn)
    return buf


def ntt_inverse(
    x: np.ndarray, itw: np.ndarray, n_inv: int, t: int
) -> np.ndarray | None:
    lib = get_lib()
    if lib is None:
        return None
    logn = int(np.log2(len(x)))
    buf = np.ascontiguousarray(x, dtype=np.uint64)
    lib.ntt_inverse_u64(
        _u64p(buf), _u64p(np.ascontiguousarray(itw)), n_inv, t, logn
    )
    return buf
