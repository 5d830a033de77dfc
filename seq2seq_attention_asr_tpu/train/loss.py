"""Masked negative-log-likelihood, matching the reference's hand-rolled
NLL: nll = -sum(labelmask * logprobs) with optional per-token
normalization (/root/reference/timit/timit.lua:262-271). The labelmask
doubles as the teacher-forcing input, so padded decoder steps are
zeroed in both the loss and the inputs.

The reference's notebooks validate this NLL against
nn.ClassNLLCriterion (AttentionSmallModel.ipynb cells 13-14, SURVEY.md
§4); tests/test_loss.py does the same against optax's
softmax_cross_entropy.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def masked_nll(
    logprobs: jnp.ndarray,
    labels_onehot: jnp.ndarray,
    dec_mask: jnp.ndarray,
    normalize: bool = False,
) -> jnp.ndarray:
    """Sum over batch of per-utterance NLL.

    logprobs: (B, T, V); labels_onehot: (B, T, V); dec_mask: (B, T).
    normalize=True divides each utterance's NLL by its true length T
    (opt.normalizeNLL, timit.lua:268-271).
    """
    per_step = -jnp.sum(labels_onehot * logprobs, axis=-1) * dec_mask  # (B, T)
    per_utt = jnp.sum(per_step, axis=-1)  # (B,)
    if normalize:
        per_utt = per_utt / jnp.maximum(jnp.sum(dec_mask, axis=-1), 1.0)
    return jnp.sum(per_utt)


def token_accuracy(
    logprobs: jnp.ndarray, labels: jnp.ndarray, dec_mask: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Teacher-forced argmax accuracy (timit.lua:285-288).

    Returns (num_correct, num_predictions) so callers can aggregate
    across batches/devices before dividing.
    """
    pred = jnp.argmax(logprobs, axis=-1)
    correct = jnp.sum((pred == labels) * dec_mask)
    total = jnp.sum(dec_mask)
    return correct, total
