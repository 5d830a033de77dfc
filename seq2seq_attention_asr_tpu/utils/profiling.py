"""Profiling/tracing — replaces the reference's wall-clock prints
(timit/timit.lua:495-564 sys.clock deltas, xlua.progress bars) with
jax.profiler traces plus a steady-state step timer that reports the
audio-seconds/s/chip headline metric (BASELINE.md)."""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax

HOP = 512
SR = 16000.0


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context; open with TensorBoard/XProf."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Accumulates step wall-times and frame counts; reports throughput.

    Call `tick(frames[, flops])` after each synchronized step.
    `audio_seconds` assumes the log-mel hop (512 samples @ 16 kHz).
    Pass per-step `flops` (e.g. from bench.model_flops_per_sample x 3
    for fwd+bwd) and a `peak_flops` to get MFU in the report."""

    def __init__(self, skip_first: int = 2, peak_flops: Optional[float] = None):
        self.skip = skip_first
        self.n = 0
        self.t_total = 0.0
        self.frames = 0
        self.flops = 0.0
        self.peak_flops = peak_flops
        self._last: Optional[float] = None

    def start(self):
        self._last = time.perf_counter()

    def tick(self, frames: int, flops: float = 0.0):
        now = time.perf_counter()
        if self._last is not None:
            self.n += 1
            if self.n > self.skip:
                self.t_total += now - self._last
                self.frames += frames
                self.flops += flops
        self._last = now

    @property
    def steps_per_s(self) -> float:
        steps = max(self.n - self.skip, 0)
        return steps / self.t_total if self.t_total > 0 else 0.0

    @property
    def audio_seconds_per_s(self) -> float:
        if self.t_total <= 0:
            return 0.0
        return (self.frames * HOP / SR) / self.t_total

    @property
    def mfu(self) -> float:
        if not (self.peak_flops and self.t_total > 0):
            return 0.0
        return self.flops / self.t_total / self.peak_flops

    def report(self) -> Dict[str, float]:
        out = {
            "steps_per_s": self.steps_per_s,
            "audio_s_per_s": self.audio_seconds_per_s,
        }
        if self.peak_flops:
            out["mfu"] = self.mfu
        return out
