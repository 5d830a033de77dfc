"""ctypes bindings for the native edit-distance kernel."""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Sequence

import numpy as np

_lib: Optional[ctypes.CDLL] = None


def _load() -> ctypes.CDLL:
    global _lib
    if _lib is None:
        from . import build

        path = build.build("editdist", verbose=False)
        lib = ctypes.CDLL(path)
        lib.asr_edit_distance.restype = ctypes.c_int64
        lib.asr_edit_distance.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
        ]
        lib.asr_batch_edit_distance.restype = None
        lib.asr_batch_edit_distance.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
        ]
        _lib = lib
    return _lib


def _as_i32(a) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(a), dtype=np.int32)


def edit_distance(a: Sequence[int], b: Sequence[int]) -> int:
    lib = _load()
    a = _as_i32(a)
    b = _as_i32(b)
    return int(
        lib.asr_edit_distance(
            a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), a.size,
            b.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), b.size,
        )
    )


def batch_edit_distance(
    a: np.ndarray, a_len: Sequence[int], b: np.ndarray, b_len: Sequence[int]
) -> np.ndarray:
    """a: (B, Ma) padded int32, b: (B, Mb); returns (B,) int64 distances."""
    lib = _load()
    a = _as_i32(a)
    b = _as_i32(b)
    al = np.ascontiguousarray(a_len, dtype=np.int64)
    bl = np.ascontiguousarray(b_len, dtype=np.int64)
    out = np.empty(a.shape[0], dtype=np.int64)
    lib.asr_batch_edit_distance(
        a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        al.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        b.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        bl.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        a.shape[0], a.shape[1], b.shape[1],
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    return out
