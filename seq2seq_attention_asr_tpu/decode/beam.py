"""On-device batched beam search.

Faithful re-design of /root/reference/Attention.lua:332-438 with the
host round-trips removed: the reference deep-copies Lua hidden-state
tables per hypothesis per step and runs `torch.topk` on CPU floats
(:370,406 — SURVEY.md §3.4 calls this the anti-pattern); here the
whole search lives in one `lax.while_loop` with K hypotheses as a
batch axis, `jax.lax.top_k` on device, and gather-based state
reindexing instead of deepcopy.

Semantics preserved exactly:
  - step 1 feeds the zero y_prev vector and zero state, takes top-K
    of the first logprobs; eos picks go straight to the finished pool
    (:357-387);
  - each later step expands only the live hypotheses (live count =
    K - finished), takes the top (K - finished) expansions by TOTAL
    logprob (no length normalization), and moves picks that hit eos —
    or the per-sample max length, WITH that final token appended — to
    the finished pool (:390-427);
  - the finished pool is never re-pruned; the answer is the finished
    hypothesis with max total logprob (:435-437);
  - maxseqlength counts post-first-step iterations, so a force-finished
    hypothesis holds maxseqlength+1 tokens;
  - eos id is caller-supplied (the reference passes the final target
    token, timit/timit.lua:398-401).

Batched over B utterances with per-sample max lengths; a sample whose
pool is full simply stops changing while the loop drains the others.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..ops import attention

NEG_INF = -1e30


class BeamResult(NamedTuple):
    tokens: jnp.ndarray  # (B, M) best finished hypothesis, 0-padded
    lengths: jnp.ndarray  # (B,) token count of the best hypothesis
    scores: jnp.ndarray  # (B,) total logprob of the best hypothesis


def beam_search(
    params,
    cfg: attention.AttentionConfig,
    h: jnp.ndarray,
    enc_lengths: jnp.ndarray,
    eos_id,
    k: int = 5,
    max_steps: jnp.ndarray | None = None,
    max_steps_cap: int | None = None,
    axis_name: str | None = None,
    backend: str = "auto",
) -> BeamResult:
    """h: (B, L, A) annotations. max_steps: (B,) per-sample cap
    (reference: utterance length L, or 2L for LibriSpeech); defaults to
    enc_lengths. max_steps_cap bounds the unrolled buffer (defaults to
    the padded L). Returns the best finished hypothesis per sample.

    With `axis_name` (inside shard_map) h is the LOCAL (B, L/n, A)
    sequence shard: attention energies/context use cross-shard
    collectives (SURVEY.md §2.6(d) — distributed beam state: the beam
    bookkeeping is replicated over the sp axis, encoder state stays
    sharded; every shard computes identical top_k decisions because the
    psum'd context and logprobs are identical). max_steps_cap is
    required under sharding (the default L would be the local length).

    backend: "auto" | "xla" | "pallas" — "pallas" runs the per-step
    attention through the fused single-step kernel
    (ops/pallas/attention_step.py: vh/h fetched once per step, not K
    times); "auto" picks it on TPU when the shapes qualify."""
    b, l_pad, _ = h.shape
    v = cfg.output_depth
    if max_steps is None:
        max_steps = enc_lengths
    cap = int(max_steps_cap if max_steps_cap is not None else l_pad)
    m = cap + 1  # force-finish appends one final token
    dtype = h.dtype
    # Score bookkeeping stays float32 even under bf16 encoder states:
    # apply_readout's log-softmax is f32, and ranking cumulative
    # logprobs in bf16 would both lose ties and break the while_loop
    # carry dtype (f32 expansion sums assigned into a bf16 carry).
    sdtype = jnp.float32
    eos_id = jnp.asarray(eos_id)
    if eos_id.ndim == 0:
        eos_id = jnp.broadcast_to(eos_id, (b,))

    if axis_name is None:
        pos = jnp.arange(l_pad)
    else:
        pos = l_pad * jax.lax.axis_index(axis_name) + jnp.arange(l_pad)
    enc_mask = (pos[None, :] < enc_lengths[:, None]).astype(dtype)
    vh = attention.precompute_vh(params, h)

    use_fused = False
    if axis_name is None and backend in ("auto", "pallas"):
        from ..ops.pallas import attention_step as _fused

        interpret = jax.default_backend() not in ("tpu", "axon")
        if _fused.supported(cfg, b, k, l_pad, dtype) and (
            backend == "pallas" or not interpret
        ):
            use_fused = True

    # Expand encoder tensors over the beam axis once: (B, K, ...). The
    # fused kernel never materializes these — only the XLA path does.
    if not use_fused:
        h_k = jnp.broadcast_to(h[:, None], (b, k) + h.shape[1:])
        vh_k = jnp.broadcast_to(vh[:, None], (b, k) + vh.shape[1:])
        mask_k = jnp.broadcast_to(enc_mask[:, None], (b, k, l_pad))

    def flat_step(state, y_prev):
        """One attention step over all (B, K) hypotheses."""
        if use_fused:
            new_state, out = _fused.fused_attention_step(
                params, cfg, state, y_prev, vh, h, enc_mask,
                interpret=interpret,
            )
            logp = attention.apply_readout(params, cfg, out["s"], out["c"])
            return new_state, logp
        fs = jax.tree.map(lambda a: a.reshape((b * k,) + a.shape[2:]), state)
        new_fs, out = attention.attention_step(
            params, cfg, fs,
            y_prev.reshape(b * k, v),
            vh_k.reshape(b * k, l_pad, -1),
            h_k.reshape(b * k, l_pad, -1),
            mask_k.reshape(b * k, l_pad),
            ramp=None,
            axis_name=axis_name,
        )
        logp = attention.apply_readout(params, cfg, out["s"], out["c"])
        unflat = jax.tree.map(lambda a: a.reshape((b, k) + a.shape[1:]), new_fs)
        return unflat, logp.reshape(b, k, v)

    class Loop(NamedTuple):
        t: jnp.ndarray
        tokens: jnp.ndarray  # (B, K, M) live hypothesis tokens
        last: jnp.ndarray  # (B, K) last token id
        lens: jnp.ndarray  # (B, K) live lengths
        scores: jnp.ndarray  # (B, K) live total logprobs
        live_count: jnp.ndarray  # (B,)
        state: Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]  # (B,K,·)
        fin_tokens: jnp.ndarray  # (B, K+1, M) pool (+1 dump slot)
        fin_lens: jnp.ndarray  # (B, K+1)
        fin_scores: jnp.ndarray  # (B, K+1)
        fin_count: jnp.ndarray  # (B,)

    def init_loop() -> Loop:
        alpha0, s0, mem0 = attention.init_state(cfg, b * k, l_pad, dtype)
        state0 = (
            alpha0.reshape(b, k, l_pad),
            s0.reshape(b, k, -1),
            mem0.reshape(b, k, -1),
        )
        return Loop(
            t=jnp.asarray(0, jnp.int32),
            tokens=jnp.zeros((b, k, m), jnp.int32),
            last=jnp.zeros((b, k), jnp.int32),
            lens=jnp.zeros((b, k), jnp.int32),
            scores=jnp.zeros((b, k), sdtype),
            live_count=jnp.ones((b,), jnp.int32),  # one empty hypothesis
            state=state0,
            fin_tokens=jnp.zeros((b, k + 1, m), jnp.int32),
            fin_lens=jnp.zeros((b, k + 1), jnp.int32),
            fin_scores=jnp.full((b, k + 1), NEG_INF, sdtype),
            fin_count=jnp.zeros((b,), jnp.int32),
        )

    def cond(lp: Loop):
        return jnp.logical_and(
            lp.t <= jnp.max(max_steps), jnp.any(lp.fin_count < k)
        )

    def body(lp: Loop) -> Loop:
        t = lp.t
        # y_prev: zero vector at t=0 (RNNAttention zeros_y), else one-hot.
        onehot = jax.nn.one_hot(lp.last, v, dtype=dtype)
        y_prev = jnp.where(jnp.equal(t, 0), jnp.zeros_like(onehot), onehot)
        new_state, logp = flat_step(lp.state, y_prev)

        # Expansion scores; dead hypothesis slots masked out.
        slot = jnp.arange(k)[None, :]
        live = slot < lp.live_count[:, None]  # (B, K)
        exp_scores = jnp.where(
            live[:, :, None], lp.scores[:, :, None] + logp, NEG_INF
        )  # (B, K, V)
        val, idx = jax.lax.top_k(exp_scores.reshape(b, k * v), k)
        parent = idx // v  # (B, K)
        token = idx % v

        # Partition picks (in rank order): the first (K - fin_count)
        # ranks are taken; eos or length-cap picks are finished.
        rank = jnp.arange(k)[None, :]
        budget = jnp.where(
            jnp.equal(t, 0), jnp.full_like(lp.fin_count, k), k - lp.fin_count
        )
        allowed = rank < budget[:, None]
        hit_cap = jnp.greater_equal(t, max_steps)[:, None]
        is_fin = allowed & (jnp.equal(token, eos_id[:, None]) | hit_cap)
        to_live = allowed & ~is_fin

        # Child hypotheses (parent tokens + new token).
        ptoks = jnp.take_along_axis(lp.tokens, parent[:, :, None], axis=1)
        plens = jnp.take_along_axis(lp.lens, parent, axis=1)
        step_onehot = jax.nn.one_hot(plens, m, dtype=ptoks.dtype)  # (B,K,M)
        ctoks = ptoks + step_onehot * token[:, :, None]
        clens = plens + 1

        # Append finished picks to the pool, preserving rank order.
        dest = jnp.where(
            is_fin, lp.fin_count[:, None] + jnp.cumsum(is_fin, axis=1) - 1, k
        )  # (B, K) in [0, K]; K = dump slot
        fin_tokens = jax.vmap(lambda ft, d, c: ft.at[d].set(c))(
            lp.fin_tokens, dest, ctoks
        )
        fin_lens = jax.vmap(lambda fl, d, c: fl.at[d].set(c))(lp.fin_lens, dest, clens)
        fin_scores = jax.vmap(lambda fs, d, c: fs.at[d].set(c))(lp.fin_scores, dest, val)
        # restore the dump slot
        fin_tokens = fin_tokens.at[:, k].set(0)
        fin_lens = fin_lens.at[:, k].set(0)
        fin_scores = fin_scores.at[:, k].set(NEG_INF)
        fin_count = lp.fin_count + jnp.sum(is_fin, axis=1, dtype=jnp.int32)

        # Compact surviving picks into the leading live slots (stable
        # by rank, so order semantics match the reference lists).
        order = jnp.argsort(~to_live, axis=1, stable=True)  # live ranks first

        def gather(a):
            idx = order.reshape(order.shape + (1,) * (a.ndim - 2))
            return jnp.take_along_axis(a, idx, axis=1)
        new_live = jnp.sum(to_live, axis=1, dtype=jnp.int32)
        sel_parent = gather(parent)
        next_state = jax.tree.map(
            lambda a: jax.vmap(lambda x, p: x[p])(a, sel_parent), new_state
        )
        samp_done = jnp.greater_equal(lp.fin_count, k)  # frozen samples

        def keep_old(new, old):
            return jnp.where(
                samp_done.reshape((b,) + (1,) * (new.ndim - 1)), old, new
            )

        return Loop(
            t=t + 1,
            tokens=keep_old(gather(ctoks), lp.tokens),
            last=keep_old(gather(token), lp.last),
            lens=keep_old(gather(clens), lp.lens),
            scores=keep_old(gather(val), lp.scores),
            live_count=keep_old(new_live, lp.live_count),
            state=jax.tree.map(keep_old, next_state, lp.state),
            fin_tokens=keep_old(fin_tokens, lp.fin_tokens),
            fin_lens=keep_old(fin_lens, lp.fin_lens),
            fin_scores=keep_old(fin_scores, lp.fin_scores),
            fin_count=keep_old(fin_count, lp.fin_count),
        )

    final = jax.lax.while_loop(cond, body, init_loop())
    best = jnp.argmax(final.fin_scores[:, :k], axis=1)  # (B,)
    take = lambda a: jax.vmap(lambda x, i: x[i])(a, best)
    return BeamResult(
        tokens=take(final.fin_tokens[:, :k]),
        lengths=take(final.fin_lens[:, :k]),
        scores=take(final.fin_scores[:, :k]),
    )
