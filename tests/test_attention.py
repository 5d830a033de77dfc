"""Attention decoder vs. an independent NumPy implementation of the
reference step math (Attention.lua:64-165), plus padding/batching
invariants the reference never had to satisfy."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seq2seq_attention_asr_tpu.ops import attention, cells
from seq2seq_attention_asr_tpu.ops.attention import AttentionConfig

CFG = AttentionConfig(
    score_depth=11,
    filt_size=5,
    feature_maps=4,
    state_depth=8,
    annotation_depth=6,
    output_depth=9,
    cell="gru",
    mono_align=False,
    readout=(("maxout", 5, 3), ("linear", 9)),
)


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def numpy_attention_step(p, cfg, alpha_prev, s_prev, y_prev, h):
    """Unbatched NumPy re-derivation of one decoder step (L, A) inputs."""
    v = np.asarray(p["v"])
    vh = h @ v
    ws = s_prev @ np.asarray(p["ws"]["w"]) + np.asarray(p["ws"]["b"])  # (S,)
    # location conv, odd filter: pad (f-1)/2 both sides
    f = cfg.filt_size
    pad_l = (f - 1) // 2 if f % 2 == 1 else f // 2
    pad_r = pad_l if f % 2 == 1 else f // 2 - 1
    padded = np.concatenate([np.zeros(pad_l), alpha_prev, np.zeros(pad_r)])
    w_conv = np.asarray(p["loc_conv"]["w"])[:, 0, :]  # (f, F)
    b_conv = np.asarray(p["loc_conv"]["b"])
    L = len(alpha_prev)
    feat = np.stack(
        [padded[i : i + f] @ w_conv + b_conv for i in range(L)]
    )  # (L, F)
    uf = feat @ np.asarray(p["u"])
    z = vh + ws[None, :] + uf
    e = np.tanh(z) @ np.asarray(p["w_e"])
    e = e - e.max()
    alpha = np.exp(e) / np.exp(e).sum()
    c = alpha @ h
    c_in = c @ np.asarray(p["c_in"]["w"]) + np.asarray(p["c_in"]["b"])
    y_in = y_prev @ np.asarray(p["y_in"]["w"]) + np.asarray(p["y_in"]["b"])
    r = (
        np.concatenate([c_in, y_in]) @ np.asarray(p["dec_in"]["w"])
        + np.asarray(p["dec_in"]["b"])
    )
    # GRU cell
    w_zr, w_h = np.asarray(p["cell"]["w_zr"]), np.asarray(p["cell"]["w_h"])
    H = w_zr.shape[1] // 2
    hx = np.concatenate([s_prev, r])
    zg = _sigmoid(hx @ w_zr[:, :H])
    rg = _sigmoid(hx @ w_zr[:, H:])
    h_cand = np.tanh(np.concatenate([rg * s_prev, r]) @ w_h)
    s = (1 - zg) * s_prev + zg * h_cand
    return alpha, c, s


def test_attention_step_matches_numpy():
    p = attention.attention_init(jax.random.PRNGKey(0), CFG)
    L = 7
    h = jax.random.normal(jax.random.PRNGKey(1), (1, L, CFG.annotation_depth))
    alpha_prev = jax.nn.softmax(jax.random.normal(jax.random.PRNGKey(2), (1, L)))
    s_prev = jax.random.normal(jax.random.PRNGKey(3), (1, CFG.state_depth))
    y_prev = jax.nn.one_hot(jnp.array([4]), CFG.output_depth)
    mem = jnp.zeros((1, CFG.state_depth))
    vh = attention.precompute_vh(p, h)
    enc_mask = jnp.ones((1, L))
    (alpha, s, _), out = attention.attention_step(
        p, CFG, (alpha_prev, s_prev, mem), y_prev, vh, h, enc_mask
    )
    na, nc, ns = numpy_attention_step(
        p, CFG, np.asarray(alpha_prev[0]), np.asarray(s_prev[0]),
        np.asarray(y_prev[0]), np.asarray(h[0]),
    )
    np.testing.assert_allclose(np.asarray(alpha[0]), na, rtol=5e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out["c"][0]), nc, rtol=5e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(s[0]), ns, rtol=5e-5, atol=1e-5)


@pytest.mark.parametrize("filt_size", [4, 5, 10])
def test_location_conv_output_length(filt_size):
    cfg = AttentionConfig(**{**CFG.__dict__, "filt_size": filt_size})
    p = attention.attention_init(jax.random.PRNGKey(0), cfg)
    alpha = jax.nn.softmax(jax.random.normal(jax.random.PRNGKey(1), (2, 13)))
    uf = attention.location_features(p, cfg, alpha)
    assert uf.shape == (2, 13, cfg.score_depth)


def test_alpha_respects_encoder_mask():
    p = attention.attention_init(jax.random.PRNGKey(0), CFG)
    L = 9
    h = jax.random.normal(jax.random.PRNGKey(1), (2, L, CFG.annotation_depth))
    enc_mask = jnp.array([[1.0] * 5 + [0.0] * 4, [1.0] * 9])
    alpha_prev = jnp.zeros((2, L))
    s_prev = jnp.zeros((2, CFG.state_depth))
    vh = attention.precompute_vh(p, h)
    alpha = attention.attention_weights(p, CFG, s_prev, alpha_prev, vh, enc_mask)
    np.testing.assert_allclose(np.asarray(alpha[0, 5:]), np.zeros(4), atol=1e-12)
    np.testing.assert_allclose(np.asarray(alpha.sum(-1)), np.ones(2), rtol=1e-6)


def test_teacher_forced_decode_shapes_and_batch1_equivalence():
    cfg = AttentionConfig(**{**CFG.__dict__, "mono_align": True, "penalty_lambda": 0.1})
    p = attention.attention_init(jax.random.PRNGKey(0), cfg)
    B, L, T = 3, 10, 6
    h = jax.random.normal(jax.random.PRNGKey(1), (B, L, cfg.annotation_depth))
    enc_lengths = jnp.array([10, 7, 4])
    labels = jax.random.randint(jax.random.PRNGKey(2), (B, T), 0, cfg.output_depth)
    onehot = jax.nn.one_hot(labels, cfg.output_depth)
    dec_lengths = jnp.array([6, 5, 2])
    dec_mask = (jnp.arange(T)[None] < dec_lengths[:, None]).astype(jnp.float32)
    out = attention.decode_teacher_forced(p, cfg, h, enc_lengths, onehot, dec_mask)
    assert out["logprobs"].shape == (B, T, cfg.output_depth)
    assert out["alpha"].shape == (B, T, L)
    assert out["penalty"].shape == (B, T)
    # log-probs normalized
    np.testing.assert_allclose(
        np.asarray(jnp.exp(out["logprobs"]).sum(-1)), np.ones((B, T)), rtol=2e-4
    )
    # batch-1 equivalence on valid region: sample b alone == sample b in batch
    b = 1
    Lb, Tb = int(enc_lengths[b]), T
    out1 = attention.decode_teacher_forced(
        p, cfg,
        h[b : b + 1, :Lb], enc_lengths[b : b + 1],
        onehot[b : b + 1], dec_mask[b : b + 1],
    )
    np.testing.assert_allclose(
        np.asarray(out1["logprobs"][0]),
        np.asarray(out["logprobs"][b]),
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(out1["alpha"][0, :, :Lb]),
        np.asarray(out["alpha"][b, :, :Lb]),
        rtol=1e-4, atol=1e-5,
    )


def test_no_location_term_when_feature_maps_zero():
    cfg = AttentionConfig(**{**CFG.__dict__, "feature_maps": 0})
    p = attention.attention_init(jax.random.PRNGKey(0), cfg)
    assert "loc_conv" not in p and "u" not in p
    h = jax.random.normal(jax.random.PRNGKey(1), (1, 5, cfg.annotation_depth))
    vh = attention.precompute_vh(p, h)
    # alpha must be independent of alpha_prev when feature_maps == 0
    s = jnp.zeros((1, cfg.state_depth))
    m = jnp.ones((1, 5))
    a1 = attention.attention_weights(p, cfg, s, jnp.zeros((1, 5)), vh, m)
    a2 = attention.attention_weights(
        p, cfg, s, jax.nn.one_hot(jnp.array([2]), 5), vh, m
    )
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), rtol=1e-6)


def test_lstm_decoder_cell_variant():
    cfg = AttentionConfig(**{**CFG.__dict__, "cell": "lstm"})
    p = attention.attention_init(jax.random.PRNGKey(0), cfg)
    B, L, T = 2, 6, 4
    h = jax.random.normal(jax.random.PRNGKey(1), (B, L, cfg.annotation_depth))
    onehot = jax.nn.one_hot(
        jax.random.randint(jax.random.PRNGKey(2), (B, T), 0, cfg.output_depth),
        cfg.output_depth,
    )
    out = attention.decode_teacher_forced(
        p, cfg, h, jnp.array([6, 3]), onehot, jnp.ones((B, T))
    )
    assert out["logprobs"].shape == (B, T, cfg.output_depth)
