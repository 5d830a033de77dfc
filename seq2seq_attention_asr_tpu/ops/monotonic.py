"""Monotonic alignment penalty — forward-identity, gradient-injecting.

Reference: /root/reference/MonotonicAlignment.lua. Forward passes alpha
through unchanged while computing a scalar penalty per sample

    p = lambda * max(0, sum_i (cumsum(alpha)_i - cumsum(alpha_prev)_i))

(MonotonicAlignment.lua:27-39). The penalty is NEVER added to the
reported loss; it only shapes gradients (SURVEY.md §2.1): wherever
p > 0 the backward pass injects a linear ramp lambda*(L+1-i) into
d(alpha) and its negation into d(alpha_prev)
(MonotonicAlignment.lua:49-75). Implemented as a `jax.custom_vjp`.

TPU-first re-derivation: with a prefix length mask (1 for i < len),

    sum_{i<len} cumsum(x)_i = sum_j x_j * max(len - j, 0)

so the penalty is a single masked weighted sum against the SAME ramp
used for gradient injection — no cumsum, and under sequence sharding
(encoder positions split across chips) it reduces with one `psum`
instead of a cross-chip scan. The ramp uses each sample's true length
and is zero at padded positions/steps, so padding cannot leak gradient.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def make_ramp(lengths: jnp.ndarray, max_len: int, lam, dtype=jnp.float32) -> jnp.ndarray:
    """lambda * (len - i) ramp per sample (0-indexed i), zero beyond len.

    Equals the reference's 1-indexed lambda*(L+1-i) ramp
    (MonotonicAlignment.lua:57).
    """
    pos = jnp.arange(max_len, dtype=dtype)[None, :]
    ramp = lengths.astype(dtype)[:, None] - pos
    return lam * jnp.maximum(ramp, 0.0)


def monotonic_penalty_value(
    alpha: jnp.ndarray,
    prev_alpha: jnp.ndarray,
    unit_ramp: jnp.ndarray,
    axis_name: Optional[str] = None,
) -> jnp.ndarray:
    """Per-sample unscaled penalty, weighted-sum form. (B, L) -> (B,).

    unit_ramp: `make_ramp(lengths, L, 1.0)` (lambda excluded). Under
    `shard_map` over encoder positions pass `axis_name` to reduce the
    partial sums across shards.
    """
    s = jnp.sum(unit_ramp * (alpha - prev_alpha), axis=-1)
    if axis_name is not None:
        s = jax.lax.psum(s, axis_name)
    return jnp.maximum(s, 0.0)


@jax.custom_vjp
def monotonic_alignment_seq(
    alpha_seq: jnp.ndarray,
    base_ramp: jnp.ndarray,
    dec_mask: jnp.ndarray,
    active: jnp.ndarray,
) -> jnp.ndarray:
    """Whole-sequence form of `monotonic_alignment` — identity on the
    stacked (B, T, L) alignment sequence, ramp-injecting in the VJP.

    Lets the FUSED decoder scan (ops/pallas/attention_scan.py) support
    penalty-active configs without kernel changes: per step t the
    reference injects +ramp into d(alpha_t) and -ramp into
    d(alpha_{t-1}) wherever penalty_t > 0 (MonotonicAlignment.lua:
    49-75). Both are additive cotangents on the kernel's alpha outputs,
    so applying them to the stacked sequence BEFORE the kernel's
    custom_vjp consumes d(alpha_seq) is algebraically identical to the
    per-step injection inside the XLA scan (attention_step):

        d(alpha_t) += inject_t - inject_{t+1},
        inject_t = [active_t > 0] * base_ramp * dec_mask_t

    base_ramp: lambda-scaled `make_ramp` (B, L); dec_mask (B, T);
    active (B, T) the per-step unscaled penalty value (computed by the
    caller from this same alpha_seq; gradient through it is cut, as in
    the per-step op where it is a residual).
    """
    return alpha_seq


def _mono_seq_fwd(alpha_seq, base_ramp, dec_mask, active):
    return alpha_seq, (base_ramp, dec_mask, active)


def _mono_seq_bwd(res, g):
    base_ramp, dec_mask, active = res
    fire = (active > 0.0).astype(base_ramp.dtype) * dec_mask  # (B, T)
    inject = fire[:, :, None] * base_ramp[:, None, :]  # (B, T, L)
    minus = jnp.concatenate(
        [inject[:, 1:], jnp.zeros_like(inject[:, :1])], axis=1
    )
    return (
        g + (inject - minus).astype(g.dtype),
        jnp.zeros_like(base_ramp),
        jnp.zeros_like(dec_mask),
        jnp.zeros_like(active),
    )


monotonic_alignment_seq.defvjp(_mono_seq_fwd, _mono_seq_bwd)


@jax.custom_vjp
def monotonic_alignment(
    alpha: jnp.ndarray, prev_alpha: jnp.ndarray, ramp: jnp.ndarray, active: jnp.ndarray
) -> jnp.ndarray:
    """Identity on alpha; the VJP injects +/-ramp where `active`.

    ramp: `make_ramp(lengths, L, lam)`, optionally pre-multiplied by a
    decoder-step validity mask. active: (B,) float penalty value
    (injection fires where it is > 0) — computed by the caller,
    shard-aware, via monotonic_penalty_value.
    """
    return alpha


def _mono_fwd(alpha, prev_alpha, ramp, active):
    return alpha, (active, ramp)


def _mono_bwd(res, g):
    active, ramp = res
    inject = jnp.where(active[:, None] > 0.0, ramp, 0.0)
    return g + inject, -inject, jnp.zeros_like(ramp), jnp.zeros_like(active)


monotonic_alignment.defvjp(_mono_fwd, _mono_bwd)
