"""ctypes bindings for the native FLAC decoder (flacdec.cpp).

`decode(data) -> (pcm (N, channels) int32, sample_rate)`; raises on any
structural decode error so callers can fall back to the pure-Python
reference decoder (data/flac.py::decode_flac_py)."""

from __future__ import annotations

import ctypes
from typing import Optional, Tuple

import numpy as np

_lib: Optional[ctypes.CDLL] = None

_PU8 = ctypes.POINTER(ctypes.c_uint8)
_PI32 = ctypes.POINTER(ctypes.c_int32)
_PI64 = ctypes.POINTER(ctypes.c_int64)


def _load() -> ctypes.CDLL:
    global _lib
    if _lib is None:
        from . import build

        lib = ctypes.CDLL(build.build("flacdec", verbose=False))
        lib.asr_flac_info.restype = ctypes.c_int64
        lib.asr_flac_info.argtypes = [_PU8, ctypes.c_int64, _PI64]
        lib.asr_flac_decode.restype = ctypes.c_int64
        lib.asr_flac_decode.argtypes = [
            _PU8, ctypes.c_int64, _PI32, ctypes.c_int64,
        ]
        _lib = lib
    return _lib


def decode(data: bytes) -> Tuple[np.ndarray, int]:
    lib = _load()
    buf = np.frombuffer(data, np.uint8)
    bp = buf.ctypes.data_as(_PU8)
    info = np.zeros(5, np.int64)
    rc = lib.asr_flac_info(bp, len(data), info.ctypes.data_as(_PI64))
    if rc != 0:
        raise ValueError("flacdec: bad STREAMINFO")
    total, sr, nch, _bps, _off = (int(v) for v in info)
    if total <= 0:
        # unknown length: size-bounded upper estimate (decoded PCM can't
        # exceed ~4x the compressed size per channel for 16-bit audio;
        # use a generous bound and retry bigger on overflow)
        total = max(len(data) * 4, 1 << 16)
    out = np.empty(total * nch, np.int32)
    n = lib.asr_flac_decode(bp, len(data), out.ctypes.data_as(_PI32), out.size)
    while n == -3:  # capacity overflow (unknown-length stream)
        out = np.empty(out.size * 2, np.int32)
        n = lib.asr_flac_decode(bp, len(data), out.ctypes.data_as(_PI32), out.size)
    if n < 0:
        raise ValueError(f"flacdec: decode error {n}")
    return out[: int(n) * nch].reshape(int(n), nch), sr
