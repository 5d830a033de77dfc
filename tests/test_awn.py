"""Adaptive weight noise vs. an independent NumPy implementation of the
reference formulas (AdaptiveWeightNoise.lua:63-104), plus trainer
integration (noise='awn' inside the jitted step, SURVEY.md §7 hard
part: 'AWN interaction with jit').
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seq2seq_attention_asr_tpu.train import awn


def _flat_ref(mu, s, lam, grad_w):
    """NumPy re-derivation on flat vectors (AdaptiveWeightNoise.lua)."""
    mu = np.asarray(mu, np.float64)
    s = np.asarray(s, np.float64)
    n = mu.size
    sigma2 = np.exp(s)
    alpha_mu = mu.mean()
    alpha_sigma2 = max(1e-12, sigma2.mean() + ((mu - alpha_mu) ** 2).mean())
    kl = (
        0.5 * (n * np.log(alpha_sigma2) - s.sum())
        + 0.5 / alpha_sigma2 * (((mu - alpha_mu) ** 2).sum() + sigma2.sum())
        - n / 2.0
    )
    g = np.asarray(grad_w, np.float64)
    d_mu = lam * (mu - alpha_mu) / alpha_sigma2 + g
    d_s = lam * 0.5 * (sigma2 / alpha_sigma2 - 1.0) + 0.5 * g * g * sigma2
    return kl, d_mu, d_s


def _tree():
    rng = np.random.RandomState(0)
    return {
        "a": jnp.asarray(rng.randn(4, 3), jnp.float32),
        "b": {"w": jnp.asarray(rng.randn(5), jnp.float32)},
    }


def _flatten(tree):
    return np.concatenate([np.ravel(l) for l in jax.tree.leaves(tree)])


def test_kl_matches_reference_formula():
    params = _tree()
    state = awn.init(params, sigma_init=0.1)
    got = float(awn.kl(state))
    want, _, _ = _flat_ref(
        _flatten(state.mu), _flatten(state.s), 1.0, _flatten(state.mu) * 0
    )
    assert got == pytest.approx(want, rel=1e-5)


def test_grads_match_reference_formula():
    params = _tree()
    state = awn.init(params, sigma_init=0.2)
    rng = np.random.RandomState(1)
    grad_w = jax.tree.map(
        lambda p: jnp.asarray(rng.randn(*p.shape), jnp.float32), params
    )
    lam = 0.7
    out = awn.grads(state, grad_w, lam)
    _, d_mu, d_s = _flat_ref(
        _flatten(state.mu), _flatten(state.s), lam, _flatten(grad_w)
    )
    np.testing.assert_allclose(_flatten(out.mu), d_mu, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(_flatten(out.s), d_s, rtol=1e-4, atol=1e-5)


def test_grads_lambda_zero_passthrough():
    """lam == 0: d_mu = dNLL/dw, d_s = 0.5 g^2 sigma^2 (the :96-103
    else-branch of AdaptiveWeightNoise.lua)."""
    params = _tree()
    state = awn.init(params, sigma_init=0.3)
    grad_w = jax.tree.map(jnp.ones_like, params)
    out = awn.grads(state, grad_w, 0.0)
    np.testing.assert_allclose(_flatten(out.mu), _flatten(grad_w))
    np.testing.assert_allclose(
        _flatten(out.s),
        0.5 * np.exp(_flatten(state.s)),
        rtol=1e-5,
    )


def test_sample_statistics_and_mode():
    params = {"w": jnp.zeros((2000,), jnp.float32)}
    state = awn.init(params, sigma_init=0.5)
    w = awn.sample(jax.random.PRNGKey(0), state)
    std = float(jnp.std(w["w"]))
    assert std == pytest.approx(0.5, rel=0.1)
    assert float(jnp.max(jnp.abs(awn.mode(state)["w"]))) == 0.0


def test_weight_noise_sample():
    params = {"w": jnp.zeros((2000,), jnp.float32)}
    w = awn.weight_noise_sample(jax.random.PRNGKey(0), params, 0.25)
    assert float(jnp.std(w["w"])) == pytest.approx(0.25, rel=0.1)


def test_awn_train_step_learns():
    """Full jitted train step with noise='awn': the AWN-regularized loss
    must fall and the posterior must stay finite."""
    from seq2seq_attention_asr_tpu.models import registry
    from seq2seq_attention_asr_tpu.train import optim as optim_lib
    from seq2seq_attention_asr_tpu.train import trainer as trainer_lib

    model = registry.build(
        "chorowski",
        input_frame_size=6, hidden_frame_size=8, output_frame_size=8,
        score_depth=12, state_depth=8, mlp_depth=8, output_depth=5,
        feature_maps=0, filt_size=5,
    )
    tcfg = trainer_lib.TrainConfig(
        normalize_nll=True, noise="awn", awn_lambda=0.01, awn_sigma_init=0.05
    )
    ocfg = optim_lib.OptimConfig()
    tx = optim_lib.build_optimizer(ocfg)
    init_fn, step_fn = trainer_lib.make_train_step(
        model.forward, tx, ocfg, tcfg, model.output_depth
    )
    step = jax.jit(step_fn)

    rng = np.random.RandomState(2)
    b, l, t = 2, 10, 5
    x = jnp.asarray(rng.randn(b, l, 6), jnp.float32)
    x_len = jnp.asarray([10, 7])
    y = jnp.asarray(rng.randint(0, 5, (b, t)))
    dec_mask = jnp.ones((b, t), jnp.float32)

    params = model.init(jax.random.PRNGKey(0))
    state = init_fn(params, jax.random.PRNGKey(1))
    train_params = state[0]
    assert isinstance(train_params, awn.AWNState)

    def mode_nll(st):
        """Deterministic NLL at the posterior mean (the eval path)."""
        p = awn.mode(st[0])
        onehot = jax.nn.one_hot(y, model.output_depth) * dec_mask[..., None]
        out = model.forward(p, x, x_len, onehot, dec_mask, train=False)
        tot = jnp.sum(onehot * out["logprobs"])
        return float(-tot / jnp.sum(dec_mask))

    before = mode_nll(state)
    nlls = []
    for _ in range(100):
        state, m = step(state, (x, x_len, y, dec_mask))
        nlls.append(float(m["nll"]))
    assert np.isfinite(nlls).all()
    after = mode_nll(state)
    # adadelta + the KL pull make progress slow on a toy batch; the
    # point is that the jitted AWN path learns in the right direction.
    assert after < before - 0.01, (before, after)
