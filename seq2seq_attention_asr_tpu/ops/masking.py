"""Length-mask utilities for padded batched sequences.

The reference executes each utterance at its true length (batchSize=1,
dynamic shapes: /root/reference/timit/timit.lua:239-240,
Attention.lua:305-322). On TPU we batch with static padded shapes and
masks instead; these helpers are the contract every op uses.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def length_mask(lengths: jnp.ndarray, max_len: int, dtype=jnp.float32) -> jnp.ndarray:
    """(B,) int lengths -> (B, max_len) {0,1} mask."""
    pos = jnp.arange(max_len)
    return (pos[None, :] < lengths[:, None]).astype(dtype)


def flip_sequences(x: jnp.ndarray, lengths: jnp.ndarray) -> jnp.ndarray:
    """Reverse each sequence about its true length, keeping padding in place.

    x: (B, L, ...) padded; lengths: (B,). Output y[b, t] = x[b, len_b-1-t]
    for t < len_b, and x[b, t] (untouched padding) otherwise. Applying
    twice is the identity. Used to run reverse-direction RNNs over padded
    batches (the reference instead iterates t = L..1 per utterance,
    RNN.lua:143-153).
    """
    max_len = x.shape[1]
    # Clamp so lengths > max_len degrade to full-length reversal instead of
    # out-of-bounds gathers (which jnp fills with NaN).
    lengths = jnp.minimum(lengths, max_len)
    idx = jnp.arange(max_len)[None, :]  # (1, L)
    flipped = lengths[:, None] - 1 - idx
    gather = jnp.where(idx < lengths[:, None], flipped, idx)
    return jnp.take_along_axis(
        x, gather.reshape(gather.shape + (1,) * (x.ndim - 2)), axis=1
    )


def masked_softmax(
    e: jnp.ndarray, mask: jnp.ndarray, axis: int = -1, axis_name: str | None = None
) -> jnp.ndarray:
    """Softmax over `axis` with positions where mask==0 forced to 0 prob.

    With `axis_name`, `axis` is additionally sharded across that mesh
    axis (sequence sharding): the max and normalizer become cross-shard
    collectives (the log-sum-exp-across-chips pattern), and the
    returned probabilities stay sharded.
    """
    e = jnp.where(mask > 0, e, NEG_INF)
    m = jnp.max(e, axis=axis, keepdims=True)
    if axis_name is not None:
        # all_gather + max instead of pmax: same result, and it has a
        # differentiation rule (the max is stop-gradient'ed below, but
        # JVP still traces through the collective).
        m = jnp.max(jax.lax.all_gather(m, axis_name), axis=0)
    e = e - jax.lax.stop_gradient(m)
    w = jnp.exp(e) * (mask > 0)
    z = jnp.sum(w, axis=axis, keepdims=True)
    if axis_name is not None:
        z = jax.lax.psum(z, axis_name)
    return w / jnp.maximum(z, 1e-30)
