"""Scan RNN layers: loop-equivalence, reverse semantics, length masking."""

import jax
import jax.numpy as jnp
import numpy as np

from seq2seq_attention_asr_tpu.ops import cells, rnn
from seq2seq_attention_asr_tpu.ops.masking import flip_sequences, length_mask


def test_flip_sequences_roundtrip():
    x = jax.random.normal(jax.random.PRNGKey(0), (3, 6, 2))
    lengths = jnp.array([6, 4, 1])
    flipped = flip_sequences(x, lengths)
    # valid region reversed
    np.testing.assert_allclose(np.asarray(flipped[1, :4]), np.asarray(x[1, :4][::-1]))
    # padding untouched
    np.testing.assert_allclose(np.asarray(flipped[1, 4:]), np.asarray(x[1, 4:]))
    # involution
    np.testing.assert_allclose(
        np.asarray(flip_sequences(flipped, lengths)), np.asarray(x)
    )


def test_gru_layer_matches_python_loop():
    p = cells.gru_init(jax.random.PRNGKey(1), 3, 4)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 5, 3))
    ys = rnn.gru_layer(p, x)
    h = jnp.zeros((2, 4))
    for t in range(5):
        h = cells.gru_step(p, x[:, t], h)
        np.testing.assert_allclose(np.asarray(ys[:, t]), np.asarray(h), rtol=1e-5, atol=1e-6)


def test_reverse_gru_layer_semantics():
    """output[t] of a reverse layer = state after consuming x[t..len-1]."""
    p = cells.gru_init(jax.random.PRNGKey(3), 3, 4)
    x = jax.random.normal(jax.random.PRNGKey(4), (1, 6, 3))
    lengths = jnp.array([4])
    ys = rnn.gru_layer(p, x, lengths, reverse=True)
    # manual backward loop over the true length
    h = jnp.zeros((1, 4))
    outs = {}
    for t in range(3, -1, -1):
        h = cells.gru_step(p, x[:, t], h)
        outs[t] = h
    for t in range(4):
        np.testing.assert_allclose(
            np.asarray(ys[:, t]), np.asarray(outs[t]), rtol=1e-5, atol=1e-6
        )


def test_forward_layer_padding_independence():
    """Valid outputs must not depend on values in the padded region."""
    p = cells.gru_init(jax.random.PRNGKey(5), 3, 4)
    x1 = jax.random.normal(jax.random.PRNGKey(6), (1, 6, 3))
    lengths = jnp.array([4])
    x2 = x1.at[:, 4:].set(99.0)
    y1 = rnn.gru_layer(p, x1, lengths)
    y2 = rnn.gru_layer(p, x2, lengths)
    np.testing.assert_allclose(np.asarray(y1[:, :4]), np.asarray(y2[:, :4]), rtol=1e-5)
    yr1 = rnn.gru_layer(p, x1, lengths, reverse=True)
    yr2 = rnn.gru_layer(p, x2, lengths, reverse=True)
    np.testing.assert_allclose(np.asarray(yr1[:, :4]), np.asarray(yr2[:, :4]), rtol=1e-5)


def test_bigru_concat_shapes_and_batch1_consistency():
    p = rnn.bigru_init(jax.random.PRNGKey(7), 3, 4)
    x = jax.random.normal(jax.random.PRNGKey(8), (3, 7, 3))
    lengths = jnp.array([7, 5, 2])
    y = rnn.bigru_layer(p, x, lengths)
    assert y.shape == (3, 7, 8)
    # batch-of-1 equivalence: each sample processed alone gives same valid rows
    for b in range(3):
        yb = rnn.bigru_layer(p, x[b : b + 1], lengths[b : b + 1])
        L = int(lengths[b])
        np.testing.assert_allclose(
            np.asarray(y[b, :L]), np.asarray(yb[0, :L]), rtol=1e-5, atol=1e-5
        )


def test_bilstm_layer_shapes():
    p = rnn.bilstm_init(jax.random.PRNGKey(9), 3, 4)
    x = jax.random.normal(jax.random.PRNGKey(10), (2, 5, 3))
    y = rnn.bilstm_layer(p, x, jnp.array([5, 3]))
    assert y.shape == (2, 5, 8)


def test_length_mask():
    m = length_mask(jnp.array([2, 0, 3]), 4)
    np.testing.assert_array_equal(
        np.asarray(m), [[1, 1, 0, 0], [0, 0, 0, 0], [1, 1, 1, 0]]
    )
