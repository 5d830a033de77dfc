"""Readout building blocks: linear, maxout, log-softmax MLP stacks.

Maxout follows the reference construction (Maxout.lua:14-19):
Linear(in -> out*window) followed by a max over each consecutive
window-sized group — here a reshape to (..., out, window) + max, which
is the XLA-friendly equivalent of View + TemporalMaxPooling.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


def _torch_init(key, fan_in: int, shape, dtype):
    bound = 1.0 / jnp.sqrt(jnp.asarray(fan_in, dtype=jnp.float32))
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def linear_init(key, dim_in: int, dim_out: int, bias: bool = True, dtype=jnp.float32) -> Params:
    kw, kb = jax.random.split(key)
    p: Params = {"w": _torch_init(kw, dim_in, (dim_in, dim_out), dtype)}
    if bias:
        p["b"] = _torch_init(kb, dim_in, (dim_out,), dtype)
    return p


def linear_apply(params: Params, x: jnp.ndarray) -> jnp.ndarray:
    y = x @ params["w"]
    if "b" in params:
        y = y + params["b"]
    return y


def maxout_init(key, dim_in: int, dim_out: int, window: int, dtype=jnp.float32) -> Params:
    return linear_init(key, dim_in, dim_out * window, dtype=dtype)


def maxout_apply(params: Params, x: jnp.ndarray, window: int) -> jnp.ndarray:
    w = int(window)
    y = linear_apply(params, x)
    y = y.reshape(y.shape[:-1] + (y.shape[-1] // w, w))
    return jnp.max(y, axis=-1)


# --- composable readout stacks -------------------------------------------
# A readout is a list of (kind, *args) layer specs ending in log_softmax,
# e.g. the TIMIT Chorowski baseline (model_chorowski_baseline.lua:53-59):
#   [("maxout", 64, 7), ("linear", 62)]

LayerSpec = Tuple


def stack_init(key, dim_in: int, specs: Sequence[LayerSpec], dtype=jnp.float32) -> List[Params]:
    params = []
    d = dim_in
    for spec in specs:
        key, sub = jax.random.split(key)
        kind = spec[0]
        if kind == "linear":
            params.append(linear_init(sub, d, spec[1], dtype=dtype))
            d = spec[1]
        elif kind == "maxout":
            params.append(maxout_init(sub, d, spec[1], spec[2], dtype=dtype))
            d = spec[1]
        elif kind in ("relu", "dropout"):
            params.append({})
        else:
            raise ValueError(f"unknown readout layer kind: {kind}")
    return params


def stack_apply(
    params: List[Params],
    specs: Sequence[LayerSpec],
    x: jnp.ndarray,
    *,
    dropout_rng: jax.Array | None = None,
    train: bool = False,
) -> jnp.ndarray:
    """Apply the stack then log_softmax (reference nn.LogSoftMax)."""
    rng = dropout_rng
    for p, spec in zip(params, specs):
        kind = spec[0]
        if kind == "linear":
            x = linear_apply(p, x)
        elif kind == "maxout":
            x = maxout_apply(p, x, spec[2])
        elif kind == "relu":
            x = jax.nn.relu(x)
        elif kind == "dropout":
            rate = spec[1]
            if train and rate > 0.0:
                assert rng is not None, "dropout in train mode needs an rng"
                rng, sub = jax.random.split(rng)
                keep = jax.random.bernoulli(sub, 1.0 - rate, x.shape)
                x = jnp.where(keep, x / (1.0 - rate), 0.0)
    # log_softmax always in float32 — under bf16 mixed precision the
    # logits are cast up so the NLL normalizer stays accurate.
    return jax.nn.log_softmax(x.astype(jnp.float32), axis=-1)
