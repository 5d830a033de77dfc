"""Monotonic alignment penalty: forward identity + exact gradient injection
vs. the reference backward rule (MonotonicAlignment.lua:49-75), and the
weighted-sum penalty form vs. the reference's cumsum formulation."""

import jax
import jax.numpy as jnp
import numpy as np

from seq2seq_attention_asr_tpu.ops import monotonic


def cumsum_penalty(alpha, prev, mask):
    """The reference formulation (MonotonicAlignment.lua:27-39), masked."""
    d = np.cumsum(alpha, -1) - np.cumsum(prev, -1)
    return np.maximum((d * mask).sum(-1), 0.0)


def test_forward_is_identity():
    alpha = jnp.array([[0.1, 0.7, 0.2]])
    prev = jnp.array([[0.5, 0.3, 0.2]])
    ramp = monotonic.make_ramp(jnp.array([3]), 3, 2.0)
    active = jnp.ones((1,))
    out = monotonic.monotonic_alignment(alpha, prev, ramp, active)
    np.testing.assert_allclose(np.asarray(out), np.asarray(alpha))


def test_penalty_value_matches_cumsum_form():
    # alpha mass earlier than prev -> cumsum(alpha) > cumsum(prev) -> penalty>0
    alpha = jnp.array([[0.8, 0.1, 0.1]])
    prev = jnp.array([[0.1, 0.1, 0.8]])
    unit_ramp = monotonic.make_ramp(jnp.array([3]), 3, 1.0)
    p = monotonic.monotonic_penalty_value(alpha, prev, unit_ramp)
    # cumsums: alpha [0.8,0.9,1.0], prev [0.1,0.2,1.0]; diff sum = 0.7+0.7+0 = 1.4
    np.testing.assert_allclose(np.asarray(p), [1.4], rtol=1e-6)
    # reversed roles -> negative sum -> clamped to 0
    p2 = monotonic.monotonic_penalty_value(prev, alpha, unit_ramp)
    np.testing.assert_allclose(np.asarray(p2), [0.0], atol=1e-7)
    # random equivalence with masked lengths
    rng = np.random.RandomState(0)
    for _ in range(10):
        L, ln = 9, rng.randint(1, 10)
        a = rng.rand(2, L)
        b = rng.rand(2, L)
        mask = (np.arange(L) < ln).astype(np.float64)
        ur = np.asarray(monotonic.make_ramp(jnp.array([ln, ln]), L, 1.0))
        got = monotonic.monotonic_penalty_value(
            jnp.asarray(a * mask), jnp.asarray(b * mask), jnp.asarray(ur)
        )
        want = cumsum_penalty(a * mask, b * mask, mask)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6, atol=1e-9)


def test_gradient_injection_matches_reference_rule():
    lam = 0.5
    L = 4
    alpha = jnp.array([[0.7, 0.1, 0.1, 0.1]])  # moves mass early => penalty > 0
    prev = jnp.array([[0.1, 0.1, 0.1, 0.7]])
    ramp = monotonic.make_ramp(jnp.array([L]), L, lam)
    unit = monotonic.make_ramp(jnp.array([L]), L, 1.0)

    def f(a, p):
        active = monotonic.monotonic_penalty_value(a, p, unit)
        return jnp.sum(monotonic.monotonic_alignment(a, p, ramp, active) * 3.0)

    ga, gp = jax.grad(f, argnums=(0, 1))(alpha, prev)
    # upstream grad is 3 everywhere; injected ramp = lam*(L+1-i), i=1..L -> [2,1.5,1,0.5]
    np.testing.assert_allclose(np.asarray(ga), [[5.0, 4.5, 4.0, 3.5]], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(gp), [[-2.0, -1.5, -1.0, -0.5]], rtol=1e-6)


def test_no_injection_when_penalty_zero():
    lam = 0.5
    L = 3
    alpha = jnp.array([[0.1, 0.1, 0.8]])
    prev = jnp.array([[0.8, 0.1, 0.1]])  # alpha later than prev -> penalty 0
    ramp = monotonic.make_ramp(jnp.array([L]), L, lam)
    unit = monotonic.make_ramp(jnp.array([L]), L, 1.0)

    def f(a, p):
        active = monotonic.monotonic_penalty_value(a, p, unit)
        return jnp.sum(monotonic.monotonic_alignment(a, p, ramp, active))

    ga, gp = jax.grad(f, argnums=(0, 1))(alpha, prev)
    np.testing.assert_allclose(np.asarray(ga), np.ones((1, L)), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(gp), np.zeros((1, L)), atol=1e-7)


def test_ramp_respects_lengths():
    ramp = monotonic.make_ramp(jnp.array([2, 4]), 4, 1.0)
    np.testing.assert_allclose(
        np.asarray(ramp), [[2.0, 1.0, 0.0, 0.0], [4.0, 3.0, 2.0, 1.0]]
    )
