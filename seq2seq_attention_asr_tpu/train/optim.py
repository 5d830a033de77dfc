"""Optimizer stack: adadelta + global-norm clip + L2 + annealed gradient
noise + column-norm projection.

Recipe parity with /root/reference/timit/timit.lua:298-348 and
exp_logmel7_chorowski_normNLL_colnorm.lua:24-41:
  - adadelta(rho=0.95, eps=1e-8) — torch optim.adadelta semantics
    (accumulator update order: variance, then delta, then acc-delta);
  - clip: g *= maxnorm/||g|| if ||g|| > maxnorm (timit.lua:298-302);
  - L2: g += wd * theta (and 0.5*wd*||theta||^2 added to the reported
    loss by the caller, timit.lua:305-308);
  - gradient noise: g += N(0, sigma^2), sigma = (eta/(1+t)^gamma)^0.5
    with t incremented per optimization step (timit.lua:311-315);
  - column-norm constraint: post-update projection of every weight
    matrix's per-output fan-in norm to <= maxval
    (TrainUtils.lua:52-104), applied after the optimizer step
    (timit.lua:346-348).

All transforms are optax `GradientTransformation`s so they compose with
anything; `build_optimizer` assembles the reference recipe.
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax


@dataclasses.dataclass(frozen=True)
class OptimConfig:
    rho: float = 0.95
    eps: float = 1e-8
    lr: float = 1.0
    maxnorm: float = 1e20  # grad clip threshold (1e20 = off)
    weight_decay: float = 0.0
    gradnoise_eta: float = 0.0
    gradnoise_gamma: float = 0.55
    colnorm_maxval: float = 1.0
    colnorm: bool = False


class AdadeltaState(NamedTuple):
    var: Any  # running E[g^2]
    acc: Any  # running E[delta^2]


def adadelta(rho: float = 0.95, eps: float = 1e-8, lr: float = 1.0):
    """torch/optim adadelta: updates returned are -lr * delta."""

    def init_fn(params):
        z = jax.tree.map(jnp.zeros_like, params)
        return AdadeltaState(var=z, acc=jax.tree.map(jnp.zeros_like, params))

    def update_fn(grads, state, params=None):
        var = jax.tree.map(lambda v, g: rho * v + (1 - rho) * g * g, state.var, grads)
        delta = jax.tree.map(
            lambda a, v, g: jnp.sqrt(a + eps) / jnp.sqrt(v + eps) * g,
            state.acc, var, grads,
        )
        acc = jax.tree.map(lambda a, d: rho * a + (1 - rho) * d * d, state.acc, delta)
        updates = jax.tree.map(lambda d: -lr * d, delta)
        return updates, AdadeltaState(var=var, acc=acc)

    return optax.GradientTransformation(init_fn, update_fn)


def clip_by_global_norm_torch(maxnorm: float):
    """g *= maxnorm/||g|| when ||g|| > maxnorm (timit.lua:298-302)."""

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(grads, state, params=None):
        norm = optax.global_norm(grads)
        scale = jnp.where(norm > maxnorm, maxnorm / (norm + 1e-30), 1.0)
        return jax.tree.map(lambda g: g * scale, grads), state

    return optax.GradientTransformation(init_fn, update_fn)


class GradNoiseState(NamedTuple):
    key: jax.Array
    t: jnp.ndarray


def gradient_noise(eta: float, gamma: float, seed: int = 0):
    """Annealed Gaussian gradient noise (timit.lua:311-315)."""

    def init_fn(params):
        del params
        return GradNoiseState(key=jax.random.PRNGKey(seed), t=jnp.zeros((), jnp.int32))

    def update_fn(grads, state, params=None):
        t = state.t + 1
        sigma = jnp.sqrt(eta / (1.0 + t.astype(jnp.float32)) ** gamma)
        leaves, treedef = jax.tree.flatten(grads)
        keys = jax.random.split(state.key, len(leaves) + 1)
        noisy = [
            g + sigma * jax.random.normal(k, g.shape, g.dtype)
            for g, k in zip(leaves, keys[1:])
        ]
        return jax.tree.unflatten(treedef, noisy), GradNoiseState(key=keys[0], t=t)

    return optax.GradientTransformation(init_fn, update_fn)


def add_weight_decay(wd: float):
    """g += wd * theta (timit.lua:307)."""

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(grads, state, params=None):
        assert params is not None, "weight decay needs params"
        return jax.tree.map(lambda g, p: g + wd * p, grads, params), state

    return optax.GradientTransformation(init_fn, update_fn)


def build_optimizer(cfg: OptimConfig) -> optax.GradientTransformation:
    """Reference order: clip -> L2 -> noise -> adadelta (timit.lua:298-343)."""
    chain = []
    if cfg.maxnorm and cfg.maxnorm < 1e19:
        chain.append(clip_by_global_norm_torch(cfg.maxnorm))
    if cfg.weight_decay > 0:
        chain.append(add_weight_decay(cfg.weight_decay))
    if cfg.gradnoise_eta > 0:
        chain.append(gradient_noise(cfg.gradnoise_eta, cfg.gradnoise_gamma))
    chain.append(adadelta(cfg.rho, cfg.eps, cfg.lr))
    return optax.chain(*chain)


# ---------------------------------------------------------------------------
# Column-norm constraint (post-update projection)
# ---------------------------------------------------------------------------


def _is_weight_leaf(path, leaf) -> bool:
    """Weight matrices only — biases and scalars excluded.

    Torch applies the constraint to every module's 2-D `.weight`
    (conv weights are 2-D (out, kW*in) views in Torch), never biases
    (TrainUtils.lua:96-103 commented out). Our convention stores
    kernels (..., fan_in, out); any float leaf with ndim >= 2 whose
    final path key does not start with 'b' is a weight. The 1-D energy
    vector w_e is a (1, scoreDepth) weight in Torch, so it is included
    as a single row.
    """
    if not hasattr(leaf, "ndim"):
        return False
    name = ""
    for k in reversed(path):
        if hasattr(k, "key"):
            name = str(k.key)
            break
    if name.startswith("b") or name == "window":
        return False
    return leaf.ndim >= 2 or name == "w_e"


def colnorm_project(params, maxval: float = 1.0):
    """Project each output unit's fan-in weight norm to <= maxval.

    Reference math (TrainUtils.lua:63-85): norm = ||w_row|| + 1e-8; rows
    with norm >= maxval are divided by norm/maxval, others unchanged.
    """

    def proj(path, w):
        if not _is_weight_leaf(path, w):
            return w
        if w.ndim == 1:  # w_e: single output row
            norm = jnp.linalg.norm(w) + 1e-8
            div = jnp.where(norm >= maxval, norm / maxval, 1.0)
            return w / div
        flat = w.reshape(-1, w.shape[-1])  # (fan_in, out)
        norm = jnp.linalg.norm(flat, axis=0) + 1e-8  # per output unit
        div = jnp.where(norm >= maxval, norm / maxval, 1.0)
        return (flat / div[None, :]).reshape(w.shape)

    return jax.tree_util.tree_map_with_path(proj, params)
