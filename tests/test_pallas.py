"""Pallas kernels vs their XLA reference implementations (interpret
mode on CPU; the same kernels compile for TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seq2seq_attention_asr_tpu.ops import cells
from seq2seq_attention_asr_tpu.ops.pallas import gru_scan as gs


def _ref_scan(xproj, h0, w_zr_h, w_h_h):
    params = {
        "w_zr": jnp.concatenate([w_zr_h, jnp.zeros((0, w_zr_h.shape[1]))], 0),
        "w_h": w_h_h,
    }
    # emulate gru_step_preproj's kernel layout: recurrent part only
    def step(h, xp):
        hdim = w_h_h.shape[1]
        xz, xr, xh = jnp.split(xp, 3, axis=-1)
        zr = jax.nn.sigmoid(h @ w_zr_h + jnp.concatenate([xz, xr], -1))
        z, r = jnp.split(zr, 2, -1)
        c = jnp.tanh((r * h) @ w_h_h + xh)
        h = (1 - z) * h + z * c
        return h, h

    _, ys = jax.lax.scan(step, h0, jnp.swapaxes(xproj, 0, 1))
    return jnp.swapaxes(ys, 0, 1)


@pytest.fixture(scope="module")
def shapes():
    b, l, h = 8, 6, 128
    k = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(k, 4)
    xproj = jax.random.normal(k1, (b, l, 3 * h)) * 0.5
    h0 = jax.random.normal(k2, (b, h)) * 0.5
    w_zr_h = jax.random.normal(k3, (h, 2 * h)) * 0.1
    w_h_h = jax.random.normal(k4, (h, h)) * 0.1
    return xproj, h0, w_zr_h, w_h_h


def test_gru_scan_forward_matches_xla(shapes):
    xproj, h0, w_zr_h, w_h_h = shapes
    want = _ref_scan(xproj, h0, w_zr_h, w_h_h)
    got = gs.gru_scan(xproj, h0, w_zr_h, w_h_h, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-6)


def test_gru_scan_grads_match_xla(shapes):
    xproj, h0, w_zr_h, w_h_h = shapes
    co = jax.random.normal(jax.random.PRNGKey(9), _ref_scan(*shapes).shape)

    def loss_ref(*args):
        return jnp.sum(_ref_scan(*args) * co)

    def loss_pl(*args):
        return jnp.sum(gs.gru_scan(*args, True) * co)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(*shapes)
    g_pl = jax.grad(loss_pl, argnums=(0, 1, 2, 3))(*shapes)
    for a, b in zip(g_ref, g_pl):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=5e-4, atol=5e-5
        )


def test_supported_gate():
    assert gs.supported(32, 256)
    assert not gs.supported(32, 200)
    assert not gs.supported(3, 256)
