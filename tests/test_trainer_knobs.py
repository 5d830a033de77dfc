"""Pin the normalize_grad / normalize_nll knob semantics.

Reference: timit/timit.lua:268-271 picks the REPORTED nll scale
(normalizeNLL); :278-281 divides only dLdlogp by the utterance length T
(normalizeGrad). The knobs are independent: normalize_grad changes the
gradients exactly as normalize_nll would, while the reported NLL stays
unnormalized.
"""

import jax
import jax.numpy as jnp
import numpy as np

from seq2seq_attention_asr_tpu.models import chorowski
from seq2seq_attention_asr_tpu.train import optim as optim_lib
from seq2seq_attention_asr_tpu.train import trainer as trainer_lib


def _setup():
    cfg = chorowski.ChorowskiConfig(
        input_frame_size=8, hidden_frame_size=12, output_frame_size=12,
        score_depth=16, state_depth=12, mlp_depth=10, output_depth=7,
        feature_maps=0, filt_size=5, penalty_lambda=0.0, mono_align=False,
    )
    params = chorowski.init(jax.random.PRNGKey(0), cfg)

    def fwd(p, x, xl, oh, dm, dropout_rng=None, train=False):
        return chorowski.forward(p, cfg, x, xl, oh, dm,
                                 dropout_rng=dropout_rng, train=train)

    rng = np.random.RandomState(0)
    b, l, t = 4, 20, 6
    x = jnp.asarray(rng.randn(b, l, 8), jnp.float32)
    xl = jnp.asarray([20, 13, 20, 9])
    y = jnp.asarray(rng.randint(0, 7, (b, t)))
    # UNEQUAL decode lengths: 1/T normalization must actually matter
    dm = (jnp.arange(t)[None, :]
          < jnp.asarray([6, 3, 5, 2])[:, None]).astype(jnp.float32)
    return params, fwd, (x, xl, y, dm)


def _one_step(params, fwd, batch, **tckw):
    ocfg = optim_lib.OptimConfig()
    tx = optim_lib.build_optimizer(ocfg)
    tcfg = trainer_lib.TrainConfig(noise="none", **tckw)
    step = jax.jit(trainer_lib.make_step_core(fwd, tx, ocfg, tcfg, 7))
    state = (params, tx.init(params), jax.random.PRNGKey(7))
    return step(state, batch)


def test_normalize_grad_scales_grads_not_loss():
    params, fwd, batch = _setup()
    (p_base, _, _), m_base = _one_step(params, fwd, batch)
    (p_ng, _, _), m_ng = _one_step(params, fwd, batch, normalize_grad=True)
    (p_nn, _, _), m_nn = _one_step(params, fwd, batch, normalize_nll=True)
    (p_both, _, _), m_both = _one_step(
        params, fwd, batch, normalize_grad=True, normalize_nll=True
    )

    # 1. normalize_nll does NOT touch the gradient (librispeech/train.lua
    #    :142-153 backprops -labelmask unconditionally): post-update
    #    params match the base step exactly.
    for a, b in zip(jax.tree.leaves(p_nn), jax.tree.leaves(p_base)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # 2. normalize_grad alone changes grads — and is the ONLY knob that
    #    does: params with both flags == params with normalize_grad only.
    for a, b in zip(jax.tree.leaves(p_ng), jax.tree.leaves(p_both)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    delta = max(
        float(jnp.max(jnp.abs(a - b)))
        for a, b in zip(jax.tree.leaves(p_ng), jax.tree.leaves(p_base))
    )
    assert delta > 0.0

    # 3. the REPORTED NLL follows normalize_nll only.
    np.testing.assert_allclose(float(m_ng["nll"]), float(m_base["nll"]),
                               rtol=1e-6)
    assert float(m_nn["nll"]) < float(m_base["nll"])  # per-utt / T smaller
    np.testing.assert_allclose(float(m_both["nll"]), float(m_nn["nll"]),
                               rtol=1e-6)

    # 4. grad_norm reflects the normalized backward signal.
    np.testing.assert_allclose(float(m_nn["grad_norm"]),
                               float(m_base["grad_norm"]), rtol=1e-6)
    assert float(m_ng["grad_norm"]) < float(m_base["grad_norm"])
