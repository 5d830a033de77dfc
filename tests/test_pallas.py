"""Pallas kernels vs their XLA reference implementations (interpret
mode on CPU; the same kernels compile for TPU)."""

import functools
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


def _bi_stack(shapes):
    xproj, h0, w_zr_h, w_h_h = shapes
    k = jax.random.PRNGKey(42)
    k1, k2, k3, k4 = jax.random.split(k, 4)
    xproj2 = jnp.stack([xproj, jax.random.normal(k1, xproj.shape) * 0.5])
    h02 = jnp.stack([h0, jax.random.normal(k2, h0.shape) * 0.5])
    wzr2 = jnp.stack([w_zr_h, jax.random.normal(k3, w_zr_h.shape) * 0.1])
    wh2 = jnp.stack([w_h_h, jax.random.normal(k4, w_h_h.shape) * 0.1])
    return xproj2, h02, wzr2, wh2


def test_bigru_scan_forward_matches_xla(shapes):
    xproj2, h02, wzr2, wh2 = _bi_stack(shapes)
    got = gs.bigru_scan(xproj2, h02, wzr2, wh2, True)
    for d in range(2):
        want = _ref_scan(xproj2[d], h02[d], wzr2[d], wh2[d])
        np.testing.assert_allclose(
            np.asarray(got[d]), np.asarray(want), rtol=2e-5, atol=2e-6
        )


def test_bigru_scan_grads_match_xla(shapes):
    args = _bi_stack(shapes)
    co = jax.random.normal(jax.random.PRNGKey(9), (2,) + _ref_scan(*shapes).shape)

    def loss_ref(xproj2, h02, wzr2, wh2):
        tot = 0.0
        for d in range(2):
            tot += jnp.sum(_ref_scan(xproj2[d], h02[d], wzr2[d], wh2[d]) * co[d])
        return tot

    def loss_pl(*a):
        return jnp.sum(gs.bigru_scan(*a, True) * co)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(*args)
    g_pl = jax.grad(loss_pl, argnums=(0, 1, 2, 3))(*args)
    for a, b in zip(g_ref, g_pl):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=5e-4, atol=5e-5
        )


@pytest.mark.parametrize("b", [8, 32])
def test_bigru_layer_pallas_matches_xla_backend(b):
    """bigru_layer(backend='pallas', interpret via CPU) == backend='xla',
    including the length-flip handling for the reverse direction,
    forward AND grads, at a recipe-like batch (32) and a tiny one (8)."""
    from seq2seq_attention_asr_tpu.ops import rnn

    key = jax.random.PRNGKey(3)
    params = rnn.bigru_init(key, 16, 128)
    x = jax.random.normal(jax.random.PRNGKey(4), (b, 6, 16))
    lengths = jnp.array(([6, 4, 3, 6, 5, 2, 6, 1] * 4)[:b])
    want = rnn.bigru_layer(params, x, lengths, backend="xla")
    got = rnn.bigru_layer(params, x, lengths, backend="pallas")
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-6
    )

    def loss(be, p, xx):
        return jnp.sum(rnn.bigru_layer(p, xx, lengths, backend=be) ** 2)

    gx = jax.grad(functools.partial(loss, "xla"), argnums=(0, 1))(params, x)
    gp = jax.grad(functools.partial(loss, "pallas"), argnums=(0, 1))(params, x)
    for a, b_ in zip(jax.tree.leaves(gx), jax.tree.leaves(gp)):
        np.testing.assert_allclose(
            np.asarray(b_), np.asarray(a), rtol=5e-4, atol=5e-5
        )


# ---------------------------------------------------------------------------
# Fused attention-decoder scan
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def attn_setup():
    from seq2seq_attention_asr_tpu.ops import attention as att

    cfg = att.AttentionConfig(
        score_depth=128, filt_size=5, feature_maps=0, state_depth=128,
        annotation_depth=256, output_depth=11, cell="gru",
        mono_align=True, penalty_lambda=0.0,
        readout=(("maxout", 16, 3), ("linear", 11)),
    )
    params = att.attention_init(jax.random.PRNGKey(0), cfg)
    b, l, t = 8, 12, 7
    key = jax.random.PRNGKey(1)
    h = jax.random.normal(key, (b, l, cfg.annotation_depth)) * 0.5
    enc_len = jnp.array([12, 9, 7, 12, 3, 11, 12, 5])
    y = jax.random.randint(jax.random.PRNGKey(2), (b, t), 0, 11)
    oh = jax.nn.one_hot(y, 11)
    dm = (jnp.arange(t)[None, :] < jnp.array([7, 5, 7, 2, 7, 6, 4, 7])[:, None]).astype(jnp.float32)
    return att, cfg, params, h, enc_len, oh, dm


def test_attention_scan_forward_matches_xla(attn_setup):
    att, cfg, params, h, enc_len, oh, dm = attn_setup
    want = att.decode_teacher_forced(params, cfg, h, enc_len, oh, dm, backend="xla")
    got = att.decode_teacher_forced(params, cfg, h, enc_len, oh, dm, backend="pallas")
    for k in ("logprobs", "alpha"):
        np.testing.assert_allclose(
            np.asarray(got[k]), np.asarray(want[k]), rtol=1e-4, atol=1e-5,
            err_msg=k,
        )


def test_attention_scan_grads_match_xla(attn_setup):
    att, cfg, params, h, enc_len, oh, dm = attn_setup

    def loss(backend, params, h):
        out = att.decode_teacher_forced(
            params, cfg, h, enc_len, oh, dm, backend=backend
        )
        nll = -jnp.sum(oh * out["logprobs"] * dm[..., None])
        # touch alpha too so its cotangent path is exercised
        return nll + 0.1 * jnp.sum(out["alpha"] ** 2)

    g_ref = jax.grad(functools.partial(loss, "xla"), argnums=(0, 1))(params, h)
    g_pl = jax.grad(functools.partial(loss, "pallas"), argnums=(0, 1))(params, h)
    flat_ref = jax.tree.leaves(g_ref)
    flat_pl = jax.tree.leaves(g_pl)
    assert len(flat_ref) == len(flat_pl)
    for a, b in zip(flat_ref, flat_pl):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-4, atol=2e-5
        )


# ---------------------------------------------------------------------------
# Fused bidirectional LSTM scan
# ---------------------------------------------------------------------------


def test_bilstm_layer_pallas_matches_xla_backend():
    from seq2seq_attention_asr_tpu.ops import rnn

    key = jax.random.PRNGKey(5)
    params = rnn.bilstm_init(key, 16, 128)
    x = jax.random.normal(jax.random.PRNGKey(6), (8, 6, 16))
    lengths = jnp.array([6, 4, 3, 6, 5, 2, 6, 1])
    want = rnn.bilstm_layer(params, x, lengths, backend="xla")
    got = rnn.bilstm_layer(params, x, lengths, backend="pallas")
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-6
    )


def test_bilstm_scan_grads_match_xla():
    from seq2seq_attention_asr_tpu.ops import rnn

    key = jax.random.PRNGKey(7)
    params = rnn.bilstm_init(key, 16, 128)
    x = jax.random.normal(jax.random.PRNGKey(8), (8, 6, 16))
    lengths = jnp.array([6, 4, 3, 6, 5, 2, 6, 1])
    co = jax.random.normal(jax.random.PRNGKey(9), (8, 6, 256))

    def loss(backend, p, xx):
        return jnp.sum(rnn.bilstm_layer(p, xx, lengths, backend=backend) * co)

    g_ref = jax.grad(functools.partial(loss, "xla"), argnums=(0, 1))(params, x)
    g_pl = jax.grad(functools.partial(loss, "pallas"), argnums=(0, 1))(params, x)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_pl)):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=5e-4, atol=5e-5
        )


def test_attention_scan_bwd_xla_matches_pallas(attn_setup):
    """The XLA reverse-scan backward (used on TPU while the Pallas
    backward is gated off) must produce identical grads to the Pallas
    backward kernel (interpret mode)."""
    from seq2seq_attention_asr_tpu.ops.pallas import attention_scan as As

    att, cfg, params, h, enc_len, oh, dm = attn_setup
    b, l, _ = h.shape
    t = oh.shape[1]
    vh = h @ params["v"]
    enc_mask = (jnp.arange(l)[None, :] < enc_len[:, None]).astype(h.dtype)
    y_prev = jnp.concatenate([jnp.zeros_like(oh[:, :1]), oh[:, :-1]], axis=1)
    yin = y_prev @ params["y_in"]["w"] + params["y_in"]["b"]
    args = (
        vh, h, enc_mask, yin,
        params["ws"]["w"], params["ws"]["b"][None, :], params["w_e"][None, :],
        params["c_in"]["w"], params["c_in"]["b"][None, :],
        params["dec_in"]["w"], params["dec_in"]["b"][None, :],
        params["cell"]["w_zr"], params["cell"]["w_h"],
    )
    s_seq, c_seq, alpha_seq = As._run_fwd(*args, 8, True)
    key = jax.random.PRNGKey(3)
    ds = jax.random.normal(key, s_seq.shape)
    dc = jax.random.normal(key, c_seq.shape)
    dal = jax.random.normal(key, alpha_seq.shape)
    pallas_out = As._run_bwd(*args, s_seq, c_seq, ds, dc, dal, 8, True)
    xla_out = As._run_bwd_xla(*args, s_seq, c_seq, ds, dc, dal)
    assert len(pallas_out) == len(xla_out)
    for a, b_ in zip(pallas_out, xla_out):
        np.testing.assert_allclose(
            np.asarray(b_), np.asarray(a), rtol=2e-4, atol=2e-5
        )


def test_logmel_pallas_matches_numpy_reference():
    """Fused STFT+mel kernel (interpret) == offline float64 NumPy path
    (data/features.py:logmel_np, itself the parity target for
    preprocess_timit.py:196-209)."""
    from seq2seq_attention_asr_tpu.data import features as F
    from seq2seq_attention_asr_tpu.ops.pallas import logmel as LM

    rng = np.random.RandomState(0)
    y = (rng.randn(16000 * 2) * 0.1).astype(np.float32)
    ref = F.logmel_np(y.astype(np.float64), 16000)
    got = np.asarray(LM.logmel_pallas(y[None], 16000, interpret=True))[0]
    assert got.shape == ref.shape  # (L, 123)
    np.testing.assert_allclose(got, ref, atol=5e-3)

    ref2 = F.logmel_stacked_np(y.astype(np.float64), 16000)
    got2 = np.asarray(
        LM.logmel_stacked_pallas(y[None], 16000, interpret=True)
    )[0]
    assert got2.shape == ref2.shape  # (3, L, 40)
    np.testing.assert_allclose(got2, ref2, atol=5e-3)


def test_logmel_pallas_matches_xla_batched():
    """Batched kernel path == logmel_jax on a 3-utterance batch,
    including the corpus (mean, std) normalization hook."""
    from seq2seq_attention_asr_tpu.data import features as F
    from seq2seq_attention_asr_tpu.ops.pallas import logmel as LM

    rng = np.random.RandomState(1)
    y = (rng.randn(3, 16000) * 0.2).astype(np.float32)
    mean = rng.randn(1, 1, 123).astype(np.float32)
    std = (1.0 + rng.rand(1, 1, 123)).astype(np.float32)
    a = np.asarray(
        LM.logmel_pallas(jnp.asarray(y), 16000, mean=mean, std=std,
                         interpret=True)
    )
    b = np.asarray(F.logmel_jax(jnp.asarray(y), 16000, mean=mean, std=std))
    assert a.shape == b.shape
    np.testing.assert_allclose(a, b, atol=5e-3)


def test_attention_scan_location_aware_matches_xla():
    """Fused location-aware decoder (feature_maps > 0: conv over the
    previous alignment inside the kernel, alpha carried in VMEM) ==
    XLA scan path, forward and all gradients."""
    from seq2seq_attention_asr_tpu.ops import attention as att

    cfg = att.AttentionConfig(
        score_depth=24, filt_size=5, feature_maps=6, state_depth=16,
        annotation_depth=20, output_depth=7,
        readout=(("maxout", 12, 7), ("linear", 7)), cell="gru",
        mono_align=False, penalty_lambda=0.0,
    )
    params = att.attention_init(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    b, l, t, v = 8, 16, 5, 7
    h = jnp.asarray(rng.randn(b, l, 20), jnp.float32)
    enc_len = jnp.asarray([16, 12, 16, 9, 16, 16, 11, 16])
    oh = jax.nn.one_hot(jnp.asarray(rng.randint(0, v, (b, t))), v)
    dm = jnp.ones((b, t), jnp.float32)
    o_x = att.decode_teacher_forced(params, cfg, h, enc_len, oh, dm,
                                    backend="xla")
    o_p = att.decode_teacher_forced(params, cfg, h, enc_len, oh, dm,
                                    backend="pallas")
    np.testing.assert_allclose(np.asarray(o_p["logprobs"]),
                               np.asarray(o_x["logprobs"]), atol=2e-5)
    np.testing.assert_allclose(np.asarray(o_p["alpha"]),
                               np.asarray(o_x["alpha"]), atol=2e-6)

    def loss(be, p, hh):
        out = att.decode_teacher_forced(p, cfg, hh, enc_len, oh, dm,
                                        backend=be)
        return -jnp.sum(out["logprobs"] * oh) + jnp.sum(out["alpha"] ** 2)

    gx = jax.grad(functools.partial(loss, "xla"), argnums=(0, 1))(params, h)
    gp = jax.grad(functools.partial(loss, "pallas"), argnums=(0, 1))(params, h)
    for a, b_ in zip(jax.tree.leaves(gx), jax.tree.leaves(gp)):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                   rtol=2e-4, atol=2e-5)


def test_fused_attention_step_matches_xla():
    """Fused single-step decode kernel (ops/pallas/attention_step.py,
    interpret) == attention.attention_step over the flattened (B*K)
    batch — both plain and location-aware attention."""
    import jax
    import jax.numpy as jnp

    from seq2seq_attention_asr_tpu.ops import attention as att
    from seq2seq_attention_asr_tpu.ops.pallas import attention_step as fused

    for fm in (0, 3):
        # flagship-shaped readout so the fused in-kernel readout path
        # (maxout window max + linear + f32 log_softmax) is exercised
        cfg = att.AttentionConfig(
            score_depth=16, filt_size=5, feature_maps=fm, state_depth=16,
            annotation_depth=24, output_depth=6, cell="gru",
            mono_align=False, penalty_lambda=0.0,
            readout=(("dropout", 0.5), ("maxout", 8, 3), ("linear", 6)),
        )
        params = att.attention_init(jax.random.PRNGKey(fm), cfg)
        b, k, l = 4, 3, 16
        rng = jax.random.PRNGKey(7)
        h = jax.random.normal(rng, (b, l, 24))
        lens = jnp.array([16, 9, 12, 5])
        mask = (jnp.arange(l)[None] < lens[:, None]).astype(h.dtype)
        vh = att.precompute_vh(params, h)
        alpha0 = jax.nn.softmax(
            jnp.where(mask[:, None] > 0,
                      jax.random.normal(rng, (b, k, l)), -1e30), -1)
        s0 = jax.random.normal(jax.random.PRNGKey(8), (b, k, 16)) * 0.3
        mem0 = jnp.zeros((b, k, 16))
        y = jax.nn.one_hot(
            jax.random.randint(jax.random.PRNGKey(9), (b, k), 0, 6), 6,
            dtype=h.dtype,
        )
        got_state, got = fused.fused_attention_step(
            params, cfg, (alpha0, s0, mem0), y, vh, h, mask,
            with_readout=True, interpret=True,
        )
        # reference: flattened XLA step
        flat = lambda a: a.reshape((b * k,) + a.shape[2:])
        h_k = jnp.broadcast_to(h[:, None], (b, k, l, 24))
        vh_k = jnp.broadcast_to(vh[:, None], (b, k) + vh.shape[1:])
        m_k = jnp.broadcast_to(mask[:, None], (b, k, l))
        want_state, want = att.attention_step(
            params, cfg, (flat(alpha0), flat(s0), flat(mem0)), flat(y),
            flat(vh_k), flat(h_k), flat(m_k), ramp=None,
        )
        for g, w in zip(got_state, want_state):
            np.testing.assert_allclose(
                np.asarray(g).reshape(w.shape), np.asarray(w),
                rtol=2e-5, atol=2e-6, err_msg=f"feature_maps={fm}",
            )
        for key in ("s", "c", "alpha"):
            np.testing.assert_allclose(
                np.asarray(got[key]).reshape(want[key].shape),
                np.asarray(want[key]), rtol=2e-5, atol=2e-6,
                err_msg=f"feature_maps={fm} {key}",
            )
        want_logp = att.apply_readout(params, cfg, want["s"], want["c"])
        np.testing.assert_allclose(
            np.asarray(got["logp"]).reshape(want_logp.shape),
            np.asarray(want_logp), rtol=2e-5, atol=2e-6,
            err_msg=f"feature_maps={fm} logp",
        )


def test_beam_search_pallas_backend_matches_xla():
    """beam_search(backend='pallas', interpret) returns identical
    hypotheses/scores to the XLA step path."""
    import jax
    import jax.numpy as jnp

    from seq2seq_attention_asr_tpu.decode import beam as beam_lib
    from seq2seq_attention_asr_tpu.ops import attention as att

    cfg = att.AttentionConfig(
        score_depth=16, filt_size=5, feature_maps=0, state_depth=16,
        annotation_depth=24, output_depth=6, cell="gru",
        mono_align=False, penalty_lambda=0.0, readout=(("linear", 6),),
    )
    params = att.attention_init(jax.random.PRNGKey(0), cfg)
    b, l = 4, 16
    h = jax.random.normal(jax.random.PRNGKey(1), (b, l, 24)) * 0.5
    lens = jnp.array([16, 9, 12, 5])
    h = h * (jnp.arange(l)[None, :, None] < lens[:, None, None])
    kw = dict(eos_id=2, k=3, max_steps=lens, max_steps_cap=l)
    want = beam_lib.beam_search(params, cfg, h, lens, backend="xla", **kw)
    got = beam_lib.beam_search(params, cfg, h, lens, backend="pallas", **kw)
    np.testing.assert_array_equal(np.asarray(got.tokens), np.asarray(want.tokens))
    np.testing.assert_array_equal(np.asarray(got.lengths), np.asarray(want.lengths))
    np.testing.assert_allclose(
        np.asarray(got.scores), np.asarray(want.scores), rtol=1e-5, atol=1e-6
    )


def test_greedy_pallas_backend_matches_xla():
    import jax
    import jax.numpy as jnp

    from seq2seq_attention_asr_tpu.decode import greedy as greedy_lib
    from seq2seq_attention_asr_tpu.ops import attention as att

    cfg = att.AttentionConfig(
        score_depth=16, filt_size=5, feature_maps=3, state_depth=16,
        annotation_depth=24, output_depth=6, cell="gru",
        mono_align=False, penalty_lambda=0.0, readout=(("linear", 6),),
    )
    params = att.attention_init(jax.random.PRNGKey(0), cfg)
    b, l = 8, 16
    h = jax.random.normal(jax.random.PRNGKey(1), (b, l, 24)) * 0.5
    lens = jnp.asarray([16, 9, 12, 5, 16, 7, 14, 16])
    want = greedy_lib.greedy_decode(params, cfg, h, lens, eos_id=2, backend="xla")
    got = greedy_lib.greedy_decode(params, cfg, h, lens, eos_id=2, backend="pallas")
    np.testing.assert_array_equal(np.asarray(got.tokens), np.asarray(want.tokens))
    np.testing.assert_array_equal(np.asarray(got.lengths), np.asarray(want.lengths))


def test_fused_step_choose_block_layout_legal():
    """Mosaic wants block sublane dims %8 (%16 bf16) or == the array
    dim: ragged eval batches (e.g. B=14) must fall through to a single
    full block, never an illegal small divisor (TPU-only lowering
    error a CPU interpret run cannot catch)."""
    import jax.numpy as jnp

    from seq2seq_attention_asr_tpu.ops.pallas import attention_step as fused

    assert fused.choose_block(32, 5, 144, 512, 512) == 32
    assert fused.choose_block(14, 5, 64, 512, 512) == 14  # full block
    assert fused.choose_block(4, 3, 16, 16, 24) == 4
    assert fused.choose_block(24, 5, 144, 512, 512) == 8
    assert fused.choose_block(24, 5, 144, 512, 512, jnp.bfloat16) == 24
    # huge single batch that cannot fit any legal block -> unsupported
    assert fused.choose_block(1000, 5, 4096, 512, 512) == 0


def test_beam_search_bf16_pallas_matches_xla():
    """bf16 encoder states through the fused step kernel: hypotheses
    match the bf16 XLA path up to bf16 reduction-order noise, f32 score
    bookkeeping (the decode operating point for
    compute_dtype='bfloat16' models).

    Exact token equality is NOT attainable by construction: the XLA
    path's masked_softmax accumulates the bf16 normalizer in input
    dtype with XLA's reduction order, while the kernel accumulates in
    f32 (tree order) — near-tied beam scores can flip either way. The
    bar is therefore >=98% token agreement + close scores; f32 configs
    keep exact parity in the other decode tests."""
    import jax
    import jax.numpy as jnp

    from seq2seq_attention_asr_tpu.decode import beam as beam_lib
    from seq2seq_attention_asr_tpu.ops import attention as att

    cfg = att.AttentionConfig(
        score_depth=16, filt_size=5, feature_maps=0, state_depth=16,
        annotation_depth=24, output_depth=6, cell="gru",
        mono_align=False, penalty_lambda=0.0, readout=(("linear", 6),),
    )
    params = att.attention_init(jax.random.PRNGKey(0), cfg)
    p16 = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
    b, l = 16, 16  # bf16 blocks want 16 sublanes
    h = (jax.random.normal(jax.random.PRNGKey(1), (b, l, 24)) * 0.5).astype(
        jnp.bfloat16
    )
    lens = jnp.asarray([16, 9, 12, 5] * 4)
    kw = dict(eos_id=2, k=3, max_steps=lens, max_steps_cap=l)
    want = beam_lib.beam_search(p16, cfg, h, lens, backend="xla", **kw)
    got = beam_lib.beam_search(p16, cfg, h, lens, backend="pallas", **kw)
    assert want.scores.dtype == jnp.float32
    tok_g, tok_w = np.asarray(got.tokens), np.asarray(want.tokens)
    agree = float(np.mean(tok_g == tok_w))
    assert agree >= 0.98, f"token agreement {agree}"
    assert float(np.mean(np.asarray(got.lengths) == np.asarray(want.lengths))) >= 0.9
    np.testing.assert_allclose(
        np.asarray(got.scores), np.asarray(want.scores), rtol=5e-3, atol=5e-3
    )


@pytest.mark.parametrize("fm", [0, 6])
def test_attention_scan_penalty_active_matches_xla(fm):
    """Penalty-active configs (mono_align && penalty_lambda > 0) on the
    FUSED path (VERDICT r3 next-round #5): the monotonic ramp is
    injected outside the kernel (monotonic_alignment_seq on the saved
    alpha sequence), so fused forward (incl. the reported penalty) and
    ALL gradients must match the XLA scan path, for both content-only
    and location-aware attention."""
    from seq2seq_attention_asr_tpu.ops import attention as att

    cfg = att.AttentionConfig(
        score_depth=24, filt_size=5, feature_maps=fm, state_depth=16,
        annotation_depth=20, output_depth=7,
        readout=(("maxout", 12, 7), ("linear", 7)), cell="gru",
        mono_align=True, penalty_lambda=0.4,
    )
    params = att.attention_init(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    b, l, t, v = 8, 16, 5, 7
    h = jnp.asarray(rng.randn(b, l, 20), jnp.float32)
    enc_len = jnp.asarray([16, 12, 16, 9, 16, 16, 11, 16])
    oh = jax.nn.one_hot(jnp.asarray(rng.randint(0, v, (b, t))), v)
    dm = (jnp.arange(t)[None, :]
          < jnp.asarray([5, 4, 5, 2, 5, 5, 3, 5])[:, None]).astype(jnp.float32)

    o_x = att.decode_teacher_forced(params, cfg, h, enc_len, oh, dm,
                                    backend="xla")
    o_p = att.decode_teacher_forced(params, cfg, h, enc_len, oh, dm,
                                    backend="pallas")
    # the injection must have something to fire on
    assert float(jnp.sum(o_x["penalty"] > 0)) > 0
    for k, tol in (("logprobs", 2e-5), ("alpha", 2e-6), ("penalty", 2e-5)):
        np.testing.assert_allclose(np.asarray(o_p[k]), np.asarray(o_x[k]),
                                   atol=tol, err_msg=k)

    def loss(be, p, hh):
        out = att.decode_teacher_forced(p, cfg, hh, enc_len, oh, dm,
                                        backend=be)
        return -jnp.sum(out["logprobs"] * oh * dm[..., None]) + jnp.sum(
            out["alpha"] ** 2
        )

    gx = jax.grad(functools.partial(loss, "xla"), argnums=(0, 1))(params, h)
    gp = jax.grad(functools.partial(loss, "pallas"), argnums=(0, 1))(params, h)
    for a, b_ in zip(jax.tree.leaves(gx), jax.tree.leaves(gp)):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                   rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("fm", [0, 6])
def test_attention_scan_penalty_grad_survives_aux_alpha(fm):
    """ADVICE r4 (high): the real training objective (trainer._loss)
    consumes ONLY logprobs — out["alpha"] is aux under
    value_and_grad(has_aux=True), so it gets no cotangent. On the fused
    path the monotonic ramp used to be injected via a custom_vjp whose
    only output was out["alpha"]; JAX pruned it and penalty-active
    configs silently trained with no penalty gradient. The fix couples
    the injected alpha into s_seq with a zero-valued term. This test
    mirrors the trainer loss exactly (logprobs only) and checks (a)
    fused grads == XLA grads, (b) the penalty gradient is actually
    present (grads differ from a penalty-free run)."""
    from seq2seq_attention_asr_tpu.ops import attention as att

    mk = lambda lam: att.AttentionConfig(
        score_depth=24, filt_size=5, feature_maps=fm, state_depth=16,
        annotation_depth=20, output_depth=7,
        readout=(("maxout", 12, 7), ("linear", 7)), cell="gru",
        mono_align=lam > 0, penalty_lambda=lam,
    )
    cfg = mk(0.4)
    params = att.attention_init(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    b, l, t, v = 8, 16, 5, 7
    h = jnp.asarray(rng.randn(b, l, 20), jnp.float32)
    enc_len = jnp.asarray([16, 12, 16, 9, 16, 16, 11, 16])
    oh = jax.nn.one_hot(jnp.asarray(rng.randint(0, v, (b, t))), v)
    dm = (jnp.arange(t)[None, :]
          < jnp.asarray([5, 4, 5, 2, 5, 5, 3, 5])[:, None]).astype(jnp.float32)

    def loss(be, c, p):
        out = att.decode_teacher_forced(p, c, h, enc_len, oh, dm, backend=be)
        # trainer._loss shape: NLL from logprobs ONLY; alpha is aux.
        per_step = -jnp.sum(oh * out["logprobs"], axis=-1) * dm
        return jnp.mean(jnp.sum(per_step, axis=-1))

    # injection must have something to fire on
    o_x = att.decode_teacher_forced(params, cfg, h, enc_len, oh, dm,
                                    backend="xla")
    assert float(jnp.sum(o_x["penalty"] > 0)) > 0

    gx = jax.grad(functools.partial(loss, "xla", cfg))(params)
    gp = jax.grad(functools.partial(loss, "pallas", cfg))(params)
    for a, b_ in zip(jax.tree.leaves(gx), jax.tree.leaves(gp)):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                   rtol=2e-4, atol=2e-5)
    # and the penalty contribution is real: fused grads with the penalty
    # differ from fused grads without it
    g0 = jax.grad(functools.partial(loss, "pallas", mk(0.0)))(params)
    delta = max(
        float(jnp.max(jnp.abs(a - b2)))
        for a, b2 in zip(jax.tree.leaves(gp), jax.tree.leaves(g0))
    )
    assert delta > 1e-4, f"penalty gradient was pruned (max delta {delta})"


@pytest.mark.parametrize("fm", [0, 6])
def test_attention_scan_bf16_matches_xla(fm):
    """bf16 fused decoder scan vs the bf16 XLA path: the kernel keeps
    f32 internals (carries/energies/softmax) with dt matmul operands —
    the convention — so it sits CLOSER to f32 ground truth than XLA's
    own bf16 path. A bf16-energies variant was tried in r5 and
    REVERTED: measured 11.29 ms/step vs 9.95 f32-internals at the
    flagship shape (Mosaic bf16 minor-dim relayouts/conversions eat
    the VPU-rate gain) AND ~4x the gradient noise vs f32 truth
    (docs/PERF.md r5 note). This test pins the bf16-model operating
    point: forward and grads agree with XLA-bf16 to rounding level."""
    from seq2seq_attention_asr_tpu.ops import attention as att

    cfg = att.AttentionConfig(
        score_depth=32, filt_size=5, feature_maps=fm, state_depth=16,
        annotation_depth=32, output_depth=7,
        readout=(("maxout", 12, 7), ("linear", 7)), cell="gru",
        mono_align=False, penalty_lambda=0.0,
    )
    params = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16),
        att.attention_init(jax.random.PRNGKey(0), cfg),
    )
    rng = np.random.RandomState(0)
    b, l, t, v = 16, 16, 5, 7
    h = jnp.asarray(rng.randn(b, l, 32) * 0.5, jnp.bfloat16)
    enc_len = jnp.asarray([16, 12, 16, 9] * 4)
    oh = jax.nn.one_hot(jnp.asarray(rng.randint(0, v, (b, t))), v,
                        dtype=jnp.bfloat16)
    dm = (jnp.arange(t)[None, :]
          < jnp.asarray([5, 4, 5, 2] * 4)[:, None]).astype(jnp.bfloat16)

    o_x = att.decode_teacher_forced(params, cfg, h, enc_len, oh, dm,
                                    backend="xla")
    o_p = att.decode_teacher_forced(params, cfg, h, enc_len, oh, dm,
                                    backend="pallas")
    np.testing.assert_allclose(
        np.asarray(o_p["logprobs"], np.float32),
        np.asarray(o_x["logprobs"], np.float32), atol=0.15,
    )
    np.testing.assert_allclose(
        np.asarray(o_p["alpha"], np.float32),
        np.asarray(o_x["alpha"], np.float32), atol=0.03,
    )

    def loss(be, p, hh, ohh, dmm):
        out = att.decode_teacher_forced(p, cfg, hh, enc_len, ohh, dmm,
                                        backend=be)
        per = -jnp.sum(ohh * out["logprobs"], axis=-1) * dmm
        return jnp.mean(jnp.sum(per.astype(jnp.float32), axis=-1))

    # Two bf16 implementations with different rounding points cannot be
    # compared against EACH OTHER stably (both sit ~0.1 rel-L2 from f32
    # truth on CPU — seed luck decides any fixed pairwise bar). The
    # principled check: the fused kernel must be no farther from the
    # F32 GROUND TRUTH than ~2x the XLA bf16 path's own distance — i.e.
    # the kernel adds at most comparable rounding noise, never a
    # systematic error.
    g_truth = jax.grad(functools.partial(loss, "xla"))(
        jax.tree.map(lambda x: x.astype(jnp.float32), params),
        h.astype(jnp.float32), oh.astype(jnp.float32),
        dm.astype(jnp.float32),
    )
    gx = jax.grad(functools.partial(loss, "xla"))(params, h, oh, dm)
    gp = jax.grad(functools.partial(loss, "pallas"))(params, h, oh, dm)
    for pth, gt, a, b_ in zip(
        jax.tree_util.tree_leaves_with_path(g_truth),
        jax.tree.leaves(g_truth), jax.tree.leaves(gx), jax.tree.leaves(gp),
    ):
        kx = jax.tree_util.keystr(pth[0])
        gt32 = np.asarray(gt, np.float32)
        n = np.linalg.norm
        den = max(float(n(gt32)), 1e-6)
        xla_err = float(n(np.asarray(a, np.float32) - gt32)) / den
        pal_err = float(n(np.asarray(b_, np.float32) - gt32)) / den
        assert pal_err <= 2.0 * xla_err + 0.02, (
            f"{kx}: pal_err {pal_err:.4f} vs xla_err {xla_err:.4f}"
        )


def test_bilstm_layer_bf16_output_dtype():
    """Under bf16 compute the fused bilstm must hand back bf16 like the
    XLA branch does — a f32 annotation broke the conv_bilstm location
    conv with a dtype mismatch on TPU (caught by the r4 bench)."""
    from seq2seq_attention_asr_tpu.ops import rnn

    params = rnn.bilstm_init(jax.random.PRNGKey(0), 16, 128)
    p16 = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 12, 16), jnp.bfloat16)
    lengths = jnp.array([12, 9, 7, 12, 3, 11, 12, 5])
    got = rnn.bilstm_layer(p16, x, lengths, backend="pallas")
    assert got.dtype == jnp.bfloat16
    want = rnn.bilstm_layer(p16, x, lengths, backend="xla")
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=0.05, atol=0.05,
    )


@pytest.mark.parametrize("fm", [0, 6])
def test_attention_scan_lstm_cell_matches_xla(fm):
    """LSTM decoder cell on the FUSED scan (the conv_bilstm recipe's
    decoder, timit.lua:137 — previously XLA-only): fused forward and
    ALL gradients must match the XLA scan path, content-only and
    location-aware."""
    from seq2seq_attention_asr_tpu.ops import attention as att

    cfg = att.AttentionConfig(
        score_depth=24, filt_size=5, feature_maps=fm, state_depth=16,
        annotation_depth=20, output_depth=7,
        readout=(("linear", 14), ("relu",), ("linear", 7)), cell="lstm",
        peepholes=False, mono_align=False, penalty_lambda=0.0,
    )
    params = att.attention_init(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    b, l, t, v = 8, 16, 5, 7
    h = jnp.asarray(rng.randn(b, l, 20), jnp.float32)
    enc_len = jnp.asarray([16, 12, 16, 9, 16, 16, 11, 16])
    oh = jax.nn.one_hot(jnp.asarray(rng.randint(0, v, (b, t))), v)
    dm = (jnp.arange(t)[None, :]
          < jnp.asarray([5, 4, 5, 2, 5, 5, 3, 5])[:, None]).astype(jnp.float32)

    o_x = att.decode_teacher_forced(params, cfg, h, enc_len, oh, dm,
                                    backend="xla")
    o_p = att.decode_teacher_forced(params, cfg, h, enc_len, oh, dm,
                                    backend="pallas")
    np.testing.assert_allclose(np.asarray(o_p["logprobs"]),
                               np.asarray(o_x["logprobs"]), atol=2e-5)
    np.testing.assert_allclose(np.asarray(o_p["alpha"]),
                               np.asarray(o_x["alpha"]), atol=2e-6)

    def loss(be, p, hh):
        out = att.decode_teacher_forced(p, cfg, hh, enc_len, oh, dm,
                                        backend=be)
        return -jnp.sum(out["logprobs"] * oh * dm[..., None]) + jnp.sum(
            out["alpha"] ** 2
        )

    gx = jax.grad(functools.partial(loss, "xla"), argnums=(0, 1))(params, h)
    gp = jax.grad(functools.partial(loss, "pallas"), argnums=(0, 1))(params, h)
    for a, b_ in zip(jax.tree.leaves(gx), jax.tree.leaves(gp)):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                   rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("fm", [0, 6])
def test_beam_search_lstm_cell_pallas_matches_xla(fm):
    """Fused single-step decode with an LSTM decoder cell (conv_bilstm
    recipe): beam_search(backend='pallas') must return identical
    hypotheses to the XLA step path, content-only and location-aware."""
    from seq2seq_attention_asr_tpu.decode import beam as beam_lib
    from seq2seq_attention_asr_tpu.ops import attention as att

    cfg = att.AttentionConfig(
        score_depth=16, filt_size=5, feature_maps=fm, state_depth=16,
        annotation_depth=24, output_depth=6, cell="lstm", peepholes=False,
        mono_align=False, penalty_lambda=0.0,
        readout=(("linear", 12), ("relu",), ("linear", 6)),
    )
    params = att.attention_init(jax.random.PRNGKey(0), cfg)
    b, l = 8, 16
    h = jax.random.normal(jax.random.PRNGKey(1), (b, l, 24)) * 0.5
    lens = jnp.array([16, 9, 12, 5, 8, 16, 11, 13])
    h = h * (jnp.arange(l)[None, :, None] < lens[:, None, None])
    kw = dict(eos_id=2, k=3, max_steps=lens, max_steps_cap=l)
    want = beam_lib.beam_search(params, cfg, h, lens, backend="xla", **kw)
    got = beam_lib.beam_search(params, cfg, h, lens, backend="pallas", **kw)
    np.testing.assert_array_equal(np.asarray(got.tokens), np.asarray(want.tokens))
    np.testing.assert_array_equal(np.asarray(got.lengths), np.asarray(want.lengths))
    np.testing.assert_allclose(
        np.asarray(got.scores), np.asarray(want.scores), rtol=1e-5, atol=1e-6
    )


def test_choose_block_bf16_budget_gating():
    """choose_block prefers the largest batch block the VMEM budget
    admits (measured faster on chip: bb=128 at conv_bilstm L'=16,
    bb=64 at chorowski L=96) while excluding the known-failing
    bb=64 @ chorowski L=144 (runs/block_tune.json compile failure)."""
    from seq2seq_attention_asr_tpu.ops.pallas import attention_scan as a

    # conv_bilstm decoder shape: tiny L' -> whole batch in one block
    assert a.choose_block(128, 16, 150, 256, jnp.bfloat16) == 128
    # chorowski L=96: 64 fits the bf16 budget
    assert a.choose_block(128, 96, 512, 512, jnp.bfloat16) == 64
    # chorowski L=144: 64 is over budget (fails to compile on v5e) -> 32
    assert a.choose_block(128, 144, 512, 512, jnp.bfloat16) == 32
    # f32 keeps the measured-era tuple
    assert a.choose_block(128, 144, 512, 512, jnp.float32) == 32


def test_greedy_lstm_cell_pallas_matches_xla():
    """Greedy decode through the fused step kernel with an LSTM cell
    must match the XLA path exactly (same kernel as beam; pins the
    mem-state plumbing on the greedy driver too)."""
    from seq2seq_attention_asr_tpu.decode import greedy as greedy_lib
    from seq2seq_attention_asr_tpu.ops import attention as att

    cfg = att.AttentionConfig(
        score_depth=16, filt_size=5, feature_maps=6, state_depth=16,
        annotation_depth=24, output_depth=6, cell="lstm", peepholes=False,
        mono_align=False, penalty_lambda=0.0,
        readout=(("linear", 6),),
    )
    params = att.attention_init(jax.random.PRNGKey(0), cfg)
    b, l = 8, 16
    h = jax.random.normal(jax.random.PRNGKey(1), (b, l, 24)) * 0.5
    lens = jnp.array([16, 9, 12, 5, 8, 16, 11, 13])
    h = h * (jnp.arange(l)[None, :, None] < lens[:, None, None])
    want = greedy_lib.greedy_decode(params, cfg, h, lens, eos_id=2,
                                    backend="xla")
    got = greedy_lib.greedy_decode(params, cfg, h, lens, eos_id=2,
                                   backend="pallas")
    np.testing.assert_array_equal(np.asarray(got.tokens), np.asarray(want.tokens))
    np.testing.assert_array_equal(np.asarray(got.lengths), np.asarray(want.lengths))
