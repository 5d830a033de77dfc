"""Build the native C++ helpers into shared libraries (ctypes ABI).

Usage: python -m seq2seq_attention_asr_tpu.native.build
The wrappers also build lazily on first import when g++ is available;
everything has a NumPy fallback, so a missing toolchain degrades
gracefully.
"""

from __future__ import annotations

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))

SOURCES = {
    "editdist": ["editdist.cpp"],
    "packing": ["packing.cpp"],
    "flacdec": ["flacdec.cpp"],
}


def build(name: str, verbose: bool = True) -> str:
    srcs = [os.path.join(HERE, s) for s in SOURCES[name]]
    out = os.path.join(HERE, f"lib{name}.so")
    if all(
        os.path.exists(out) and os.path.getmtime(out) >= os.path.getmtime(s)
        for s in srcs
    ):
        return out
    cmd = [
        "g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
        *srcs, "-o", out,
    ]
    if verbose:
        print("+", " ".join(cmd), file=sys.stderr)
    subprocess.check_call(cmd)
    return out


def build_all() -> None:
    for name, srcs in SOURCES.items():
        if all(os.path.exists(os.path.join(HERE, s)) for s in srcs):
            build(name)


if __name__ == "__main__":
    build_all()
