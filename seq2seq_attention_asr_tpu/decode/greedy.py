"""Greedy (argmax) decoding — the K=1 fast path.

Not present in the reference (which always beam-searches with K=5,
timit/timit.lua:399-401) but the natural smoke-test decoder and the
RTF speed-of-light reference point. One `lax.scan` over the padded
step budget with a finished mask; stops contributing tokens after eos.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import attention


class GreedyResult(NamedTuple):
    tokens: jnp.ndarray  # (B, M)
    lengths: jnp.ndarray  # (B,)
    logprob: jnp.ndarray  # (B,) total logprob of emitted tokens


def greedy_decode(
    params,
    cfg: attention.AttentionConfig,
    h: jnp.ndarray,
    enc_lengths: jnp.ndarray,
    eos_id,
    max_steps: jnp.ndarray | None = None,
    max_steps_cap: int | None = None,
    backend: str = "auto",
) -> GreedyResult:
    b, l_pad, _ = h.shape
    v = cfg.output_depth
    dtype = h.dtype
    if max_steps is None:
        max_steps = enc_lengths
    cap = int(max_steps_cap if max_steps_cap is not None else l_pad)
    eos_id = jnp.asarray(eos_id)
    if eos_id.ndim == 0:
        eos_id = jnp.broadcast_to(eos_id, (b,))

    enc_mask = (jnp.arange(l_pad)[None, :] < enc_lengths[:, None]).astype(dtype)
    vh = attention.precompute_vh(params, h)
    state0 = attention.init_state(cfg, b, l_pad, dtype)

    use_fused = False
    fuse_readout = False
    if backend in ("auto", "pallas"):
        from ..ops.pallas import attention_step as _fused

        interpret = jax.default_backend() not in ("tpu", "axon")
        if _fused.supported(cfg, b, 1, l_pad, dtype) and (
            backend == "pallas" or not interpret
        ):
            use_fused = True
            fuse_readout = _fused.readout_fusable(cfg)

    def step(carry, t):
        state, last, done, total = carry
        onehot = jax.nn.one_hot(last, v, dtype=dtype)
        y_prev = jnp.where(jnp.equal(t, 0), jnp.zeros_like(onehot), onehot)
        if use_fused:
            # K=1 hypothesis grid through the fused single-step kernel
            # (readout + log_softmax in-kernel too when fusable)
            st1 = jax.tree.map(lambda a: a[:, None], state)
            new1, out1 = _fused.fused_attention_step(
                params, cfg, st1, y_prev[:, None], vh, h, enc_mask,
                with_readout=fuse_readout, interpret=interpret,
            )
            new_state = jax.tree.map(lambda a: a[:, 0], new1)
            out = {kk: vv[:, 0] for kk, vv in out1.items()}
        else:
            new_state, out = attention.attention_step(
                params, cfg, state, y_prev, vh, h, enc_mask, ramp=None
            )
        logp = out["logp"] if "logp" in out else attention.apply_readout(
            params, cfg, out["s"], out["c"]
        )
        tok = jnp.argmax(logp, axis=-1).astype(jnp.int32)
        tok_lp = jnp.take_along_axis(logp, tok[:, None], axis=1)[:, 0]
        emit = ~done
        total = total + jnp.where(emit, tok_lp, 0.0)
        done_next = done | jnp.equal(tok, eos_id) | (t + 1 >= max_steps)
        state = jax.tree.map(
            lambda n, o: jnp.where(
                done.reshape((b,) + (1,) * (n.ndim - 1)), o, n
            ),
            new_state,
            state,
        )
        last = jnp.where(done, last, tok)
        return (state, last, done_next, total), (
            jnp.where(emit, tok, 0),
            emit.astype(jnp.int32),
        )

    init = (
        state0,
        jnp.zeros((b,), jnp.int32),
        jnp.zeros((b,), bool),
        jnp.zeros((b,), jnp.float32),  # logprob total: f32 like the readout
    )
    (_, _, _, total), (toks, emits) = jax.lax.scan(
        step, init, jnp.arange(cap, dtype=jnp.int32)
    )
    return GreedyResult(
        tokens=jnp.swapaxes(toks, 0, 1),
        lengths=jnp.sum(jnp.swapaxes(emits, 0, 1), axis=1),
        logprob=total,
    )
