"""GRU/LSTM cell math vs. independent NumPy references + grad checks.

Ports the reference's notebook-driven equivalence checks
(Attention.ipynb cells 33-44, see SURVEY.md §4) into real unit tests.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seq2seq_attention_asr_tpu.ops import cells


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def numpy_gru_step(params, x, h):
    """Independent NumPy GRU mirroring reference GRU.lua:22-30."""
    w_zr = np.asarray(params["w_zr"])
    w_h = np.asarray(params["w_h"])
    H = w_zr.shape[1] // 2
    hx = np.concatenate([h, x], axis=-1)
    z = _sigmoid(hx @ w_zr[:, :H])
    r = _sigmoid(hx @ w_zr[:, H:])
    h_cand = np.tanh(np.concatenate([r * h, x], axis=-1) @ w_h)
    return (1.0 - z) * h + z * h_cand


def test_gru_step_matches_numpy():
    key = jax.random.PRNGKey(0)
    p = cells.gru_init(key, 5, 7)
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 5))
    h = jax.random.normal(jax.random.PRNGKey(2), (3, 7))
    got = cells.gru_step(p, x, h)
    want = numpy_gru_step(p, np.asarray(x), np.asarray(h))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=2e-5)


def test_gru_preproj_equivalence():
    key = jax.random.PRNGKey(3)
    p = cells.gru_init(key, 5, 7)
    x = jax.random.normal(jax.random.PRNGKey(4), (3, 5))
    h = jax.random.normal(jax.random.PRNGKey(5), (3, 7))
    direct = cells.gru_step(p, x, h)
    pre = cells.gru_step_preproj(p, cells.gru_input_proj(p, x), h)
    np.testing.assert_allclose(np.asarray(direct), np.asarray(pre), rtol=1e-4, atol=2e-5)


def numpy_lstm_step(params, x, h, c):
    w_x, w_h, b = (np.asarray(params[k]) for k in ("w_x", "w_h", "b"))
    H = w_h.shape[0]
    gates = x @ w_x + h @ w_h + b
    gi, gf, gc, go = [gates[..., i * H : (i + 1) * H] for i in range(4)]
    peep = params.get("w_peep")
    if peep is not None:
        gi = gi + c @ np.asarray(peep["in"]) + np.asarray(peep["b_in"])
        gf = gf + c @ np.asarray(peep["forget"]) + np.asarray(peep["b_forget"])
    i, f, g = _sigmoid(gi), _sigmoid(gf), np.tanh(gc)
    nc = f * c + i * g
    if peep is not None:
        go = go + nc @ np.asarray(peep["out"]) + np.asarray(peep["b_out"])
    nh = _sigmoid(go) * np.tanh(nc)
    return nh, nc


@pytest.mark.parametrize("peepholes", [False, True])
def test_lstm_step_matches_numpy(peepholes):
    p = cells.lstm_init(jax.random.PRNGKey(0), 4, 6, peepholes)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 4))
    h = jax.random.normal(jax.random.PRNGKey(2), (2, 6))
    c = jax.random.normal(jax.random.PRNGKey(3), (2, 6))
    nh, nc = cells.lstm_step(p, x, (h, c))
    wh, wc = numpy_lstm_step(p, np.asarray(x), np.asarray(h), np.asarray(c))
    np.testing.assert_allclose(np.asarray(nh), wh, rtol=1e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(nc), wc, rtol=1e-4, atol=2e-5)


def test_lstm_preproj_equivalence():
    p = cells.lstm_init(jax.random.PRNGKey(7), 4, 6)
    x = jax.random.normal(jax.random.PRNGKey(8), (2, 4))
    h = jax.random.normal(jax.random.PRNGKey(9), (2, 6))
    c = jax.random.normal(jax.random.PRNGKey(10), (2, 6))
    d_h, d_c = cells.lstm_step(p, x, (h, c))
    p_h, p_c = cells.lstm_step_preproj(p, cells.lstm_input_proj(p, x), (h, c))
    np.testing.assert_allclose(np.asarray(d_h), np.asarray(p_h), rtol=1e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(d_c), np.asarray(p_c), rtol=1e-4, atol=2e-5)


def test_gru_gradcheck_finite_differences():
    p = cells.gru_init(jax.random.PRNGKey(11), 3, 4)
    x = jax.random.normal(jax.random.PRNGKey(12), (2, 3))
    h = jax.random.normal(jax.random.PRNGKey(13), (2, 4))

    def loss(w_h):
        return jnp.sum(cells.gru_step({**p, "w_h": w_h}, x, h) ** 2)

    g = jax.grad(loss)(p["w_h"])
    eps = 1e-3
    w = np.asarray(p["w_h"]).copy()
    for idx in [(0, 0), (3, 2), (6, 3)]:
        wp, wm = w.copy(), w.copy()
        wp[idx] += eps
        wm[idx] -= eps
        fd = (loss(jnp.asarray(wp)) - loss(jnp.asarray(wm))) / (2 * eps)
        np.testing.assert_allclose(np.asarray(g)[idx], fd, rtol=2e-2, atol=1e-4)
