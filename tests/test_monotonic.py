"""Monotonic alignment penalty: forward identity + exact gradient injection
vs. the reference backward rule (MonotonicAlignment.lua:49-75)."""

import jax
import jax.numpy as jnp
import numpy as np

from seq2seq_attention_asr_tpu.ops import monotonic


def test_forward_is_identity():
    alpha = jnp.array([[0.1, 0.7, 0.2]])
    prev = jnp.array([[0.5, 0.3, 0.2]])
    mask = jnp.ones((1, 3))
    ramp = monotonic.make_ramp(jnp.array([3]), 3, 2.0)
    out = monotonic.monotonic_alignment(alpha, prev, ramp, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(alpha))


def test_penalty_value():
    # alpha mass earlier than prev -> cumsum(alpha) > cumsum(prev) -> penalty>0
    alpha = jnp.array([[0.8, 0.1, 0.1]])
    prev = jnp.array([[0.1, 0.1, 0.8]])
    mask = jnp.ones((1, 3))
    p = monotonic.monotonic_penalty_value(alpha, prev, mask)
    # cumsums: alpha [0.8,0.9,1.0], prev [0.1,0.2,1.0]; diff sum = 0.7+0.7+0 = 1.4
    np.testing.assert_allclose(np.asarray(p), [1.4], rtol=1e-6)
    # reversed roles -> negative sum -> clamped to 0
    p2 = monotonic.monotonic_penalty_value(prev, alpha, mask)
    np.testing.assert_allclose(np.asarray(p2), [0.0], atol=1e-7)


def test_gradient_injection_matches_reference_rule():
    lam = 0.5
    L = 4
    alpha = jnp.array([[0.7, 0.1, 0.1, 0.1]])  # moves mass early => penalty > 0
    prev = jnp.array([[0.1, 0.1, 0.1, 0.7]])
    mask = jnp.ones((1, L))
    ramp = monotonic.make_ramp(jnp.array([L]), L, lam)

    def f(a, p):
        return jnp.sum(monotonic.monotonic_alignment(a, p, ramp, mask) * 3.0)

    ga, gp = jax.grad(f, argnums=(0, 1))(alpha, prev)
    # upstream grad is 3 everywhere; injected ramp = lam*(L+1-i), i=1..L -> [2,1.5,1,0.5]
    np.testing.assert_allclose(np.asarray(ga), [[5.0, 4.5, 4.0, 3.5]], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(gp), [[-2.0, -1.5, -1.0, -0.5]], rtol=1e-6)


def test_no_injection_when_penalty_zero():
    lam = 0.5
    L = 3
    alpha = jnp.array([[0.1, 0.1, 0.8]])
    prev = jnp.array([[0.8, 0.1, 0.1]])  # alpha later than prev -> penalty 0
    mask = jnp.ones((1, L))
    ramp = monotonic.make_ramp(jnp.array([L]), L, lam)

    def f(a, p):
        return jnp.sum(monotonic.monotonic_alignment(a, p, ramp, mask))

    ga, gp = jax.grad(f, argnums=(0, 1))(alpha, prev)
    np.testing.assert_allclose(np.asarray(ga), np.ones((1, L)), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(gp), np.zeros((1, L)), atol=1e-7)


def test_ramp_respects_lengths():
    ramp = monotonic.make_ramp(jnp.array([2, 4]), 4, 1.0)
    np.testing.assert_allclose(
        np.asarray(ramp), [[2.0, 1.0, 0.0, 0.0], [4.0, 3.0, 2.0, 1.0]]
    )
