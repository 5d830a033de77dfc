"""Monotonic alignment penalty — forward-identity, gradient-injecting.

Reference: /root/reference/MonotonicAlignment.lua. Forward passes alpha
through unchanged while computing a scalar penalty per sample

    p = lambda * max(0, sum_i (cumsum(alpha)_i - cumsum(alpha_prev)_i))

(MonotonicAlignment.lua:27-39). The penalty is NEVER added to the
reported loss; it only shapes gradients (see SURVEY.md §2.1): wherever
p > 0 the backward pass injects a linear ramp lambda*(L+1-i) into
d(alpha) and its negation into d(alpha_prev)
(MonotonicAlignment.lua:49-75). Implemented as a `jax.custom_vjp`.

Batched/padded extension (new capability): the ramp uses each sample's
true encoder length and is zeroed at padded encoder positions and at
padded decoder steps, so padding cannot leak gradient.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def monotonic_penalty_value(
    alpha: jnp.ndarray, prev_alpha: jnp.ndarray, enc_mask: jnp.ndarray
) -> jnp.ndarray:
    """Per-sample unscaled penalty max(0, sum_i cumsum-diff). (B,L)->(B,)."""
    d = jnp.cumsum(alpha, axis=-1) - jnp.cumsum(prev_alpha, axis=-1)
    return jnp.maximum(jnp.sum(d * enc_mask, axis=-1), 0.0)


def make_ramp(lengths: jnp.ndarray, max_len: int, lam, dtype=jnp.float32) -> jnp.ndarray:
    """lambda * (L+1-i) ramp per sample, zero beyond the true length.

    With 0-indexed position i the reference's 1-indexed (L+1-i) ramp
    (MonotonicAlignment.lua:57) becomes (len - i) for i < len.
    """
    pos = jnp.arange(max_len, dtype=dtype)[None, :]
    ramp = lengths.astype(dtype)[:, None] - pos
    return lam * jnp.where(pos < lengths[:, None], ramp, 0.0)


@jax.custom_vjp
def monotonic_alignment(
    alpha: jnp.ndarray, prev_alpha: jnp.ndarray, ramp: jnp.ndarray, enc_mask: jnp.ndarray
) -> jnp.ndarray:
    """Identity on alpha; injects the ramp gradient in the VJP.

    ramp: precomputed via `make_ramp`, optionally pre-multiplied by a
    per-sample decoder-step validity mask (B, 1)-broadcastable.
    """
    return alpha


def _mono_fwd(alpha, prev_alpha, ramp, enc_mask):
    penalty = monotonic_penalty_value(alpha, prev_alpha, enc_mask)
    return alpha, (penalty > 0.0, ramp)


def _mono_bwd(res, g):
    active, ramp = res
    inject = jnp.where(active[:, None], ramp, 0.0)
    return g + inject, -inject, jnp.zeros_like(ramp), jnp.zeros_like(ramp)


monotonic_alignment.defvjp(_mono_fwd, _mono_bwd)
