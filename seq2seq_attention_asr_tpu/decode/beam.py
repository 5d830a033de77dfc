"""On-device batched beam search (parent-pointer formulation).

Faithful re-design of /root/reference/Attention.lua:332-438 with the
host round-trips removed: the reference deep-copies Lua hidden-state
tables per hypothesis per step and runs `torch.topk` on CPU floats
(:370,406 — SURVEY.md §3.4 calls this the anti-pattern); here the
whole search lives in one `lax.while_loop` with K hypotheses as a
batch axis and `jax.lax.top_k` on device.

Decode on TPU is launch-bound, not FLOP-bound: the fused attention
step kernel is ~0.1 ms but a naive formulation spends 2-3x that on
per-step bookkeeping. This implementation therefore never materializes
token buffers inside the loop:

  - each step appends ONE packed (parent, token) row to a
    (cap+1, B, K) history via `dynamic_update_index_in_dim` (aliased
    in-place by XLA as a loop carry);
  - the finished pool holds only scalars per slot — score and a packed
    (step, parent, token) record (all < 2^24, kept exactly in f32);
  - the hypothesis tokens are reconstructed ONCE after the while_loop
    by backtracking parent pointers with a length-cap `lax.scan`;
  - all pool writes and live-slot compaction are tiny one-hot einsums
    (K x K matmuls) instead of scatters/argsort-gathers, so XLA fuses
    them into the surrounding elementwise work.

Semantics preserved exactly (tests/test_decode.py pins them against an
independent replica of the reference algorithm):

  - step 1 feeds the zero y_prev vector and zero state, takes top-K
    of the first logprobs; eos picks go straight to the finished pool
    (:357-387);
  - each later step expands only the live hypotheses (live count =
    K - finished), takes the top (K - finished) expansions by TOTAL
    logprob (no length normalization), and moves picks that hit eos —
    or the per-sample max length, WITH that final token appended — to
    the finished pool (:390-427);
  - the finished pool is never re-pruned; the answer is the finished
    hypothesis with max total logprob (:435-437), first-written wins
    ties exactly as the materialized-pool version did;
  - maxseqlength counts post-first-step iterations, so a force-finished
    hypothesis holds maxseqlength+1 tokens;
  - eos id is caller-supplied (the reference passes the final target
    token, timit/timit.lua:398-401).

Batched over B utterances with per-sample max lengths. A sample whose
pool is full gets budget 0, so every pick routes to the dropped dump
column and its pool provably stops changing while the loop drains the
others — no explicit freeze masking needed.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence, Tuple

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
    sync_axes: Optional[Sequence[str]] = None,
    backend: str = "auto",
) -> BeamResult:
    """h: (B, L, A) annotations. max_steps: (B,) per-sample cap
    (reference: utterance length L, or 2L for LibriSpeech); defaults to
    enc_lengths. max_steps_cap bounds the history buffer (defaults to
    the padded L). Returns the best finished hypothesis per sample.

    With `axis_name` (inside shard_map) h is the LOCAL (B, L/n, A)
    sequence shard: attention energies/context use cross-shard
    collectives (SURVEY.md §2.6(d) — distributed beam state: the beam
    bookkeeping is replicated over the sp axis, encoder state stays
    sharded; every shard computes identical top_k decisions because the
    psum'd context and logprobs are identical). max_steps_cap is
    required under sharding (the default L would be the local length).

    `sync_axes` (required whenever the loop body contains collectives —
    i.e. whenever axis_name is set — and the caller's mesh has MORE
    axes than axis_name): the full set of mesh axis names to agree the
    while_loop trip count over. Without it, shards whose samples finish
    early would exit the loop while neighbours still execute the
    location conv's halo `ppermute` (ops/attention.py:_halo_exchange),
    deadlocking the collective (the MULTICHIP_r03 failure: dp shards
    have shard-local `max_steps`/`fin_count`, so their data-dependent
    trip counts diverge). The loop carries a continue flag computed at
    the END of each body via `lax.pmax` over `sync_axes`, so every
    device in the mesh runs the identical number of iterations; a
    shard whose samples are all finished keeps stepping with budget 0
    (its pool provably stops changing) until the global flag drops.
    Per-sample results are bitwise identical to the unsharded search.

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
    fuse_readout = False
    # Measured crossover (runs/serve_probe.json, one v5e chip, flagship
    # serving shapes): at b*k < 16 rows the fused step kernel LOSES to
    # the XLA path (b=1/k=5: 96 vs 83 ms p50 — the rows pad to one
    # sublane tile and the per-step kernel overhead dominates), while at
    # b*k >= 40 it wins (b=8/k=5: 123 vs 136 ms). Auto mode therefore
    # only fuses with at least one full sublane tile of beam rows;
    # backend="pallas" still forces the kernel (parity tests).
    enough_rows = b * k >= 16
    if axis_name is None and backend in ("auto", "pallas"):
        from ..ops.pallas import attention_step as _fused

        interpret = jax.default_backend() not in ("tpu", "axon")
        if _fused.supported(cfg, b, k, l_pad, dtype) and (
            backend == "pallas" or (not interpret and enough_rows)
        ):
            use_fused = True
            # whole step = ONE kernel launch (decode is launch-bound):
            # the readout MLP + f32 log_softmax run in-kernel too
            fuse_readout = _fused.readout_fusable(cfg)

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
                with_readout=fuse_readout, interpret=interpret,
            )
            if fuse_readout:
                return new_state, out["logp"]
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

    # Loop bound, agreed across every device in `sync_axes` (hoisted —
    # it is loop-invariant). jnp.max over the batch first so the
    # collective reduces a scalar.
    t_max = jnp.max(max_steps)
    if sync_axes:
        t_max = jax.lax.pmax(t_max, tuple(sync_axes))

    def _still_going(t_next, fin_count):
        """Continue predicate evaluated at the end of a body iteration
        (equals what the old data-dependent `cond` would compute at the
        next loop top). Under `sync_axes` it is pmax-agreed so all
        shards run the same trip count — collectives inside the body
        (halo ppermute, context psum, softmax LSE) stay in lockstep."""
        unfinished = jnp.any(fin_count < k)
        if sync_axes:
            unfinished = (
                jax.lax.pmax(unfinished.astype(jnp.int32), tuple(sync_axes)) > 0
            )
        return jnp.logical_and(t_next <= t_max, unfinished)

    class Loop(NamedTuple):
        t: jnp.ndarray
        go: jnp.ndarray  # () bool, globally agreed continue flag
        last: jnp.ndarray  # (B, K) last token id of each live slot
        scores: jnp.ndarray  # (B, K) live total logprobs
        live_count: jnp.ndarray  # (B,)
        state: Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]  # (B,K,·)
        hist: jnp.ndarray  # (cap+1, B, K) packed token*K + parent
        fin_scores: jnp.ndarray  # (B, K)
        fin_meta: jnp.ndarray  # (B, K, 3) f32 (step, parent, token)
        fin_count: jnp.ndarray  # (B,)

    # Varying-manual-axes annotations for shard_map's check_vma: the
    # zero-initialized carry components are constants, but every body
    # output is batch-varying (derived from h/lens, sharded over the
    # non-sequence mesh axes) and the alignment state additionally
    # varies over the sequence axis. `pvary` marks the inits to match
    # so the while_loop carry types agree under the check.
    batch_axes = tuple(a for a in (sync_axes or ()) if a != axis_name)
    seq_axes = batch_axes + ((axis_name,) if axis_name else ())
    _vary = lambda x, axes: jax.lax.pcast(x, tuple(axes), to="varying") if axes else x

    def init_loop() -> Loop:
        alpha0, s0, mem0 = attention.init_state(cfg, b * k, l_pad, dtype)
        state0 = (
            _vary(alpha0.reshape(b, k, l_pad), seq_axes),
            _vary(s0.reshape(b, k, -1), batch_axes),
            _vary(mem0.reshape(b, k, -1), batch_axes),
        )
        return Loop(
            t=jnp.asarray(0, jnp.int32),
            go=_still_going(jnp.asarray(0, jnp.int32), jnp.zeros((b,), jnp.int32)),
            last=_vary(jnp.zeros((b, k), jnp.int32), batch_axes),
            scores=_vary(jnp.zeros((b, k), sdtype), batch_axes),
            live_count=_vary(jnp.ones((b,), jnp.int32), batch_axes),
            state=state0,
            hist=_vary(jnp.zeros((cap + 1, b, k), jnp.int32), batch_axes),
            fin_scores=_vary(jnp.full((b, k), NEG_INF, sdtype), batch_axes),
            fin_meta=_vary(jnp.zeros((b, k, 3), sdtype), batch_axes),
            fin_count=_vary(jnp.zeros((b,), jnp.int32), batch_axes),
        )

    def cond(lp: Loop):
        # Pure carry read — the data-dependent predicate (and any
        # collective agreement it needs) was computed at the end of the
        # previous body iteration, where collectives are guaranteed to
        # execute in lockstep across shards.
        return lp.go

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

        # Append finished picks to the pool in rank order. dest == K is
        # the dump column, dropped by the [..., :k] slice, so samples
        # with a full pool (budget 0 -> is_fin all False) write nothing.
        dest = jnp.where(
            is_fin, lp.fin_count[:, None] + jnp.cumsum(is_fin, axis=1) - 1, k
        )  # (B, K) in [0, K]
        wm = jax.nn.one_hot(dest, k + 1, dtype=sdtype)[..., :k]  # (B,K,K)
        written = jnp.sum(wm, axis=1)  # (B, K) 0/1 per pool slot
        fin_scores = lp.fin_scores * (1.0 - written) + jnp.einsum(
            "bks,bk->bs", wm, val
        )
        meta = jnp.stack(
            [
                jnp.broadcast_to(t.astype(sdtype), (b, k)),
                parent.astype(sdtype),
                token.astype(sdtype),
            ],
            axis=-1,
        )  # (B, K, 3)
        fin_meta = lp.fin_meta * (1.0 - written[:, :, None]) + jnp.einsum(
            "bks,bkc->bsc", wm, meta
        )
        fin_count = lp.fin_count + jnp.sum(is_fin, axis=1, dtype=jnp.int32)

        # Compact surviving picks into the leading live slots (stable by
        # rank, so order semantics match the reference lists). cm maps
        # picks -> slots; dead slots get zeros, masked by live_count
        # next step.
        live_dest = jnp.where(to_live, jnp.cumsum(to_live, axis=1) - 1, k)
        cm = jax.nn.one_hot(live_dest, k + 1, dtype=sdtype)[..., :k]  # (B,K,K)
        new_live = jnp.sum(to_live, axis=1, dtype=jnp.int32)
        sel_scores = jnp.einsum("bks,bk->bs", cm, val)
        sel_token = jnp.einsum("bks,bk->bs", cm, token.astype(sdtype))
        sel_parent = jnp.einsum("bks,bk->bs", cm, parent.astype(sdtype))
        # State reindex: slot s takes the state of its pick's parent.
        # gmat = cm^T @ onehot(parent): (B, K_slot, K_old) permutation.
        gmat = jnp.einsum(
            "brs,brj->bsj", cm, jax.nn.one_hot(parent, k, dtype=sdtype)
        )
        next_state = jax.tree.map(
            lambda a: jnp.einsum("bsj,bj...->bs...", gmat.astype(a.dtype), a),
            new_state,
        )
        # One packed history row per step (token*K + parent; token < 2^24
        # exact in the f32 sel_* sums). Written in place as a loop carry.
        code = (sel_token * k + sel_parent).astype(jnp.int32)
        hist = jax.lax.dynamic_update_index_in_dim(lp.hist, code, t, axis=0)

        return Loop(
            t=t + 1,
            go=_still_going(t + 1, fin_count),
            last=sel_token.astype(jnp.int32),
            scores=sel_scores,
            live_count=new_live,
            state=next_state,
            hist=hist,
            fin_scores=fin_scores,
            fin_meta=fin_meta,
            fin_count=fin_count,
        )

    final = jax.lax.while_loop(cond, body, init_loop())

    # Best finished hypothesis (argmax total logprob, first write wins
    # ties — pool order is insertion order, as in the reference lists).
    best = jnp.argmax(final.fin_scores, axis=1)  # (B,)
    bh = jax.nn.one_hot(best, k, dtype=sdtype)
    bscore = jnp.sum(final.fin_scores * bh, axis=1)
    bmeta = jnp.einsum("bk,bkc->bc", bh, final.fin_meta)
    bstep = bmeta[:, 0].astype(jnp.int32)  # step of the final token
    bparent = bmeta[:, 1].astype(jnp.int32)  # live slot at step-1
    btok = bmeta[:, 2].astype(jnp.int32)  # final token
    # Every live hypothesis at step t holds exactly t tokens, so a
    # hypothesis finished at step t has t+1 (its appended final token).
    lengths = bstep + 1

    # Single backtrack through the parent-pointer history: walk steps
    # bstep-1 .. 0 emitting tokens in place (runs once, outside the
    # decode loop — cap tiny gathers total instead of per step).
    hist_tok = final.hist // k  # (cap+1, B, K)
    hist_par = final.hist % k

    def backstep(slot, xs):
        tok_s, par_s, s = xs  # (B,K), (B,K), ()
        active = s < bstep  # (B,)
        take = lambda a: jnp.take_along_axis(a, slot[:, None], axis=1)[:, 0]
        tok = jnp.where(active, take(tok_s), 0)
        new_slot = jnp.where(active, take(par_s), slot)
        return new_slot, tok

    _, toks = jax.lax.scan(
        backstep,
        bparent,
        (hist_tok[:cap], hist_par[:cap], jnp.arange(cap)),
        reverse=True,
    )  # toks: (cap, B), position s holds the hypothesis token at step s
    tokens = jnp.concatenate(
        [toks.T, jnp.zeros((b, 1), jnp.int32)], axis=1
    )  # (B, M)
    tokens = tokens + jax.nn.one_hot(bstep, m, dtype=jnp.int32) * btok[:, None]

    return BeamResult(tokens=tokens, lengths=lengths, scores=bscore)
