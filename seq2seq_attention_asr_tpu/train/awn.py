"""Adaptive weight noise (Graves 2011 variational regularizer).

Reference: /root/reference/AdaptiveWeightNoise.lua. The learnable state
is (mu, s) with s = log sigma^2 per parameter; training samples
w = mu + sigma * eps per step (:27-38), evaluates at w = mu (:58-61),
and optimizes L = lambda*KL + NLL where the KL is against an adapted
scalar Gaussian prior (alpha_mu, alpha_sigma2) recomputed in closed
form from the current posterior (:63-80):

    alpha_mu     = mean(mu)
    alpha_sigma2 = max(eps, mean(sigma^2) + mean((mu - alpha_mu)^2))
    KL = 0.5*(n*log(alpha_sigma2) - sum(s))
       + 0.5/alpha_sigma2 * (sum((mu-alpha_mu)^2) + sum(sigma^2)) - n/2

Gradients (:82-104):
    dL/dmu = lambda*(mu - alpha_mu)/alpha_sigma2 + dNLL/dw
    dL/ds  = lambda/2*(sigma^2/alpha_sigma2 - 1) + 0.5*(dNLL/dw)^2*sigma^2

Unlike the reference's flat 2n-vector (getParameters), the state here
stays a pytree mirroring the model params, so it shards naturally under
pjit; the scalar prior statistics are global tree reductions.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Tuple

import jax
import jax.numpy as jnp

EPS = 1e-12


class AWNState(NamedTuple):
    mu: Any  # pytree like model params
    s: Any  # pytree like model params, s = log sigma^2


def init(params, sigma_init: float = 0.075) -> AWNState:
    """mu <- params, s <- log(sigma_init^2) (AdaptiveWeightNoise.lua:40-56)."""
    s0 = jnp.log(jnp.asarray(sigma_init, jnp.float32) ** 2)
    return AWNState(
        mu=params, s=jax.tree.map(lambda p: jnp.full_like(p, s0), params)
    )


def _tree_size(tree) -> jnp.ndarray:
    return sum(jnp.asarray(l.size, jnp.float32) for l in jax.tree.leaves(tree))


def _tree_sum(tree) -> jnp.ndarray:
    return sum(jnp.sum(l) for l in jax.tree.leaves(tree))


def sample(key, state: AWNState):
    """w = mu + sigma * eps, fresh eps per call (per train step)."""
    leaves, treedef = jax.tree.flatten(state.mu)
    s_leaves = jax.tree.leaves(state.s)
    keys = jax.random.split(key, len(leaves))
    out = [
        m + jnp.exp(0.5 * s) * jax.random.normal(k, m.shape, m.dtype)
        for m, s, k in zip(leaves, s_leaves, keys)
    ]
    return jax.tree.unflatten(treedef, out)


def mode(state: AWNState):
    """Eval-time weights: the posterior mean (AdaptiveWeightNoise.lua:58-61)."""
    return state.mu


def prior_stats(state: AWNState) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(alpha_mu, alpha_sigma2, n) global scalars."""
    n = _tree_size(state.mu)
    alpha_mu = _tree_sum(state.mu) / n
    sigma2_sum = _tree_sum(jax.tree.map(jnp.exp, state.s))
    centered = jax.tree.map(lambda m: (m - alpha_mu) ** 2, state.mu)
    alpha_sigma2 = jnp.maximum(EPS, sigma2_sum / n + _tree_sum(centered) / n)
    return alpha_mu, alpha_sigma2, n


def kl(state: AWNState) -> jnp.ndarray:
    """Unscaled KL(posterior || adapted prior) (AdaptiveWeightNoise.lua:72-74)."""
    alpha_mu, alpha_sigma2, n = prior_stats(state)
    s_sum = _tree_sum(state.s)
    sigma2_sum = _tree_sum(jax.tree.map(jnp.exp, state.s))
    sq_sum = _tree_sum(jax.tree.map(lambda m: (m - alpha_mu) ** 2, state.mu))
    return (
        0.5 * (n * jnp.log(alpha_sigma2) - s_sum)
        + 0.5 / alpha_sigma2 * (sq_sum + sigma2_sum)
        - n / 2.0
    )


def grads(state: AWNState, grad_w, lam: float) -> AWNState:
    """Transform dNLL/dw (at the sampled w) into (dL/dmu, dL/ds).

    Matches AdaptiveWeightNoise.lua:82-104 including the lambda == 0
    passthrough branch.
    """
    sigma2 = jax.tree.map(jnp.exp, state.s)
    d_s_nll = jax.tree.map(lambda g, v: 0.5 * g * g * v, grad_w, sigma2)
    # lam may be a traced scalar; only take the static-zero shortcut
    # when it is a concrete Python number. For lam == 0 the general
    # formulas below reduce to the shortcut anyway.
    if isinstance(lam, (int, float)) and lam <= 0.0:
        return AWNState(mu=grad_w, s=d_s_nll)
    alpha_mu, alpha_sigma2, _ = prior_stats(state)
    d_mu = jax.tree.map(
        lambda m, g: lam * (m - alpha_mu) / alpha_sigma2 + g, state.mu, grad_w
    )
    d_s = jax.tree.map(
        lambda v, dn: lam * 0.5 * (v / alpha_sigma2) - lam * 0.5 + dn, sigma2, d_s_nll
    )
    return AWNState(mu=d_mu, s=d_s)


# --- fixed-sigma weight noise (reference WeightNoise.lua) ------------------


def weight_noise_sample(key, params, sigma: float):
    """w = theta + sigma*eps (WeightNoise.lua:17-22); grads pass through."""
    leaves, treedef = jax.tree.flatten(params)
    keys = jax.random.split(key, len(leaves))
    out = [
        p + sigma * jax.random.normal(k, p.shape, p.dtype)
        for p, k in zip(leaves, keys)
    ]
    return jax.tree.unflatten(treedef, out)
