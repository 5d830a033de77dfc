"""Native C++ helpers (ctypes ABI) with graceful Python fallbacks.

Build with ``python -m seq2seq_attention_asr_tpu.native.build`` or let
the wrappers compile lazily on first use.
"""

from . import editdist  # noqa: F401
