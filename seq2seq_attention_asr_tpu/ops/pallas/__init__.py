"""Pallas TPU kernels for the hot paths (SURVEY.md §2.5 native-component
obligations): fused GRU time scan (gru_scan), fused attention step
(attention_step). Each has an XLA fallback in ops/ kept in numerical
lockstep by tests; kernels are opt-in via the `backend` arguments on
the ops-layer entry points."""

from . import gru_scan  # noqa: F401
