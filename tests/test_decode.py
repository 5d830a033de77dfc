"""Beam search / greedy decode / edit distance tests.

The beam test checks the on-device `lax.while_loop` search against an
independent pure-Python replica of the reference algorithm
(/root/reference/Attention.lua:332-438): expand live hyps, take the top
(K - finished) by total logprob, retire eos/max-length picks, answer =
max-total-logprob finished hypothesis (no length normalization).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seq2seq_attention_asr_tpu.decode import (
    beam_search,
    edit_distance_np,
    error_rate,
    greedy_decode,
)
from seq2seq_attention_asr_tpu.ops import attention


def brute_edit_distance(a, b):
    m, n = len(a), len(b)
    d = np.zeros((m + 1, n + 1), np.int64)
    d[:, 0] = np.arange(m + 1)
    d[0, :] = np.arange(n + 1)
    for i in range(1, m + 1):
        for j in range(1, n + 1):
            if a[i - 1] == b[j - 1]:
                d[i, j] = d[i - 1, j - 1]
            else:
                d[i, j] = 1 + min(d[i - 1, j], d[i, j - 1], d[i - 1, j - 1])
    return d[m, n]


def test_edit_distance_matches_bruteforce():
    rng = np.random.RandomState(0)
    for _ in range(50):
        a = rng.randint(0, 5, size=rng.randint(0, 12))
        b = rng.randint(0, 5, size=rng.randint(0, 12))
        assert edit_distance_np(a, b) == brute_edit_distance(a, b)


def test_error_rate():
    preds = [np.array([1, 2, 3]), np.array([4])]
    targs = [np.array([1, 2, 4]), np.array([4])]
    assert error_rate(preds, None, targs) == pytest.approx((1 / 3 + 0) / 2)


# ---------------------------------------------------------------------------
# Reference beam replica (independent implementation for equivalence)
# ---------------------------------------------------------------------------


def reference_beam(step_fn, v, eos, k, max_steps):
    """step_fn(last_token_or_None, state) -> (logprobs (V,), new_state)."""
    logp, state = step_fn(None, None)
    order = np.argsort(-logp)[:k]
    live, finished = [], []
    for j in order:
        if j == eos:
            finished.append(([int(j)], float(logp[j])))
        else:
            live.append(([int(j)], float(logp[j]), state))
    count = 0
    while len(finished) < k and count < max_steps:
        count += 1
        cands = []
        for rank, (toks, score, st) in enumerate(live):
            lp, nst = step_fn(toks[-1], st)
            for j in range(v):
                cands.append((score + float(lp[j]), rank, j, nst))
        cands.sort(key=lambda c: -c[0])
        budget = k - len(finished)
        new_live = []
        for score, rank, j, nst in cands[:budget]:
            toks = live[rank][0] + [j]
            if j == eos or count == max_steps:
                finished.append((toks, score))
            else:
                new_live.append((toks, score, nst))
        live = new_live
    best = max(finished, key=lambda f: f[1])
    return best


@pytest.fixture(scope="module")
def tiny_attention():
    cfg = attention.AttentionConfig(
        score_depth=12, filt_size=5, feature_maps=3, state_depth=8,
        annotation_depth=10, output_depth=6, mono_align=False,
        readout=(("maxout", 8, 2), ("linear", 6)),
    )
    params = attention.attention_init(jax.random.PRNGKey(3), cfg)
    return cfg, params


def test_beam_matches_reference_replica(tiny_attention):
    cfg, params = tiny_attention
    l, v, k = 7, cfg.output_depth, 3
    h = jax.random.normal(jax.random.PRNGKey(5), (1, l, cfg.annotation_depth))
    enc_len = jnp.array([l])
    eos = 4
    max_steps = 6

    enc_mask = jnp.ones((1, l))
    vh = attention.precompute_vh(params, h)

    def step_fn(last, state):
        if state is None:
            state = attention.init_state(cfg, 1, l)
            y_prev = jnp.zeros((1, v))
        else:
            y_prev = jax.nn.one_hot(jnp.array([last]), v)
        new_state, out = attention.attention_step(
            params, cfg, state, y_prev, vh, h, enc_mask, ramp=None
        )
        logp = attention.apply_readout(params, cfg, out["s"], out["c"])
        return np.asarray(logp[0], np.float64), new_state

    want_toks, want_score = reference_beam(step_fn, v, eos, k, max_steps)

    got = beam_search(
        params, cfg, h, enc_len, eos, k=k,
        max_steps=jnp.array([max_steps]), max_steps_cap=max_steps,
    )
    got_toks = list(np.asarray(got.tokens[0][: int(got.lengths[0])]))
    assert got_toks == want_toks
    assert float(got.scores[0]) == pytest.approx(want_score, abs=1e-4)


def test_beam_batch_matches_solo(tiny_attention):
    """Batching must not change any sample's result (padding isolation)."""
    cfg, params = tiny_attention
    v, k = cfg.output_depth, 3
    lens = [9, 5]
    l_pad = 9
    key = jax.random.PRNGKey(11)
    h = jax.random.normal(key, (2, l_pad, cfg.annotation_depth))
    h = h * (jnp.arange(l_pad)[None, :, None] < jnp.array(lens)[:, None, None])
    batch = beam_search(
        params, cfg, h, jnp.array(lens), eos_id=2, k=k,
        max_steps=jnp.array(lens), max_steps_cap=l_pad,
    )
    for i, ln in enumerate(lens):
        solo = beam_search(
            params, cfg, h[i : i + 1, :ln], jnp.array([ln]), eos_id=2, k=k,
            max_steps=jnp.array([ln]), max_steps_cap=l_pad,
        )
        assert int(batch.lengths[i]) == int(solo.lengths[0])
        np.testing.assert_array_equal(
            np.asarray(batch.tokens[i][: int(batch.lengths[i])]),
            np.asarray(solo.tokens[0][: int(solo.lengths[0])]),
        )
        assert float(batch.scores[i]) == pytest.approx(float(solo.scores[0]), abs=1e-4)


def test_beam_budget_exceeds_padded_length(tiny_attention):
    """The 2L budget (eval_len_factor=2.0, librispeech/train.lua:251-252)
    must survive past the padded input length: with an eos id that is
    never emitted, every hypothesis force-finishes at max_steps=2L and
    holds 2L+1 tokens — strictly longer than L_pad."""
    cfg, params = tiny_attention
    l, v, k = 6, cfg.output_depth, 3
    h = jax.random.normal(jax.random.PRNGKey(13), (1, l, cfg.annotation_depth))
    res = beam_search(
        params, cfg, h, jnp.array([l]), eos_id=v,  # v is out of range: no eos
        k=k, max_steps=jnp.array([2 * l]), max_steps_cap=2 * l,
    )
    assert int(res.lengths[0]) == 2 * l + 1
    assert int(res.lengths[0]) > l
    assert res.tokens.shape[1] == 2 * l + 1


def test_greedy_terminates_and_scores(tiny_attention):
    cfg, params = tiny_attention
    l = 8
    h = jax.random.normal(jax.random.PRNGKey(7), (2, l, cfg.annotation_depth))
    res = greedy_decode(params, cfg, h, jnp.array([l, 6]), eos_id=1)
    assert res.tokens.shape == (2, l)
    assert int(res.lengths[0]) >= 1 and int(res.lengths[0]) <= l
    assert int(res.lengths[1]) <= 6
    assert bool(jnp.all(res.logprob <= 0.0))
