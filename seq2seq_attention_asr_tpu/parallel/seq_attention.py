"""Sequence-sharded attention decoding — encoder states split over chips.

New capability scoped by BASELINE.json (SURVEY.md §2.6(c)): when the
utterance length L exceeds one chip's appetite, the encoder annotations
h (B, L, A) are sharded over the mesh's "sp" axis and the decoder's
attention runs under `shard_map` with the collectives inserted in
ops/attention.py:

  - energies e are computed on local position shards;
  - the softmax normalizer is a cross-shard log-sum-exp
    (`pmax` + `psum`, ops/masking.py:masked_softmax);
  - the location conv over the previous alignment exchanges
    filter-support halos with neighbor shards via `ppermute`
    (ops/attention.py:_halo_exchange);
  - the context c = alpha^T h and the monotonic penalty are local
    partial sums reduced with `psum`;
  - decoder state (s, mem) and outputs stay replicated across "sp".

The wrapper composes with data parallelism: specs below carry both
axes, so h is P("dp", "sp", None) while labels are P("dp").
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops import attention
from .mesh import DATA_AXIS, SEQ_AXIS


def sharded_decode_teacher_forced(
    mesh: Mesh,
    params,
    cfg: attention.AttentionConfig,
    h: jnp.ndarray,
    enc_lengths: jnp.ndarray,
    labels_onehot: jnp.ndarray,
    dec_mask: jnp.ndarray,
    *,
    dropout_rng: Optional[jax.Array] = None,
    train: bool = False,
    unroll: int = 1,
) -> Dict[str, jnp.ndarray]:
    """Teacher-forced decode with h sharded (B/dp, L/sp, A).

    Padded L must divide the sp axis size. Returns the same dict as
    attention.decode_teacher_forced; `alpha` comes back sharded over
    positions, logprobs/penalty replicated over sp.

    The readout MLP (and its dropout) runs OUTSIDE the shard_map: the
    (s, c) sequences it consumes are sp-replicated, so hoisting it (a)
    avoids computing the readout redundantly on every sp shard and (b)
    draws the dropout mask at global batch shape under GSPMD — bitwise
    identical across mesh shapes (tests/test_parallel.py parity).
    """

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(
            P(),  # params replicated
            P(DATA_AXIS, SEQ_AXIS, None),  # h
            P(DATA_AXIS),  # enc_lengths
            P(DATA_AXIS, None, None),  # labels_onehot
            P(DATA_AXIS, None),  # dec_mask
        ),
        out_specs={
            "s": P(DATA_AXIS, None, None),
            "c": P(DATA_AXIS, None, None),
            "alpha": P(DATA_AXIS, None, SEQ_AXIS),
            "penalty": P(DATA_AXIS, None),
        },
    )
    def run(p, h_loc, lens, onehot, dmask):
        return attention.decode_teacher_forced(
            p, cfg, h_loc, lens, onehot, dmask,
            unroll=unroll, axis_name=SEQ_AXIS, with_readout=False,
        )

    out = run(params, h, enc_lengths, labels_onehot, dec_mask)
    logprobs = attention.apply_readout(
        params, cfg, out.pop("s"), out.pop("c"),
        dropout_rng=dropout_rng, train=train,
    )
    out["logprobs"] = logprobs
    return out


def sharded_beam_search(
    mesh: Mesh,
    params,
    cfg: attention.AttentionConfig,
    h: jnp.ndarray,
    enc_lengths: jnp.ndarray,
    eos_id,
    k: int = 5,
    max_steps: Optional[jnp.ndarray] = None,
    max_steps_cap: Optional[int] = None,
):
    """Beam search with h sharded (B/dp, L/sp, A) — SURVEY.md §2.6(d).

    The beam state (hypotheses, scores, finished pool) is replicated
    over "sp"; only the encoder annotations and the per-hypothesis
    alignment state stay position-sharded. max_steps defaults to the
    GLOBAL enc_lengths; max_steps_cap defaults to the global padded L.

    The while_loop trip count is agreed over EVERY mesh axis
    (`sync_axes=mesh.axis_names` passed to beam_search): with dp > 1
    the per-dp-shard `max_steps`/finished counts differ, and a shard
    exiting the decode loop early while its neighbours still run the
    location-conv halo `ppermute` deadlocks the collective (the
    MULTICHIP_r03 rc=134 failure — see decode/beam.py docstring).
    """
    from ..decode import beam as beam_lib

    if max_steps is None:
        max_steps = enc_lengths
    if max_steps_cap is None:
        max_steps_cap = h.shape[1]
    eos = jnp.broadcast_to(jnp.asarray(eos_id), (h.shape[0],))

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(
            P(),
            P(DATA_AXIS, SEQ_AXIS, None),  # h
            P(DATA_AXIS),  # enc_lengths (global values, replicated on sp)
            P(DATA_AXIS),  # eos
            P(DATA_AXIS),  # max_steps
        ),
        out_specs=beam_lib.BeamResult(
            tokens=P(DATA_AXIS, None),
            lengths=P(DATA_AXIS),
            scores=P(DATA_AXIS),
        ),
    )
    def run(p, h_loc, lens, eos_loc, msteps):
        return beam_lib.beam_search(
            p, cfg, h_loc, lens, eos_loc, k=k,
            max_steps=msteps, max_steps_cap=max_steps_cap,
            axis_name=SEQ_AXIS, sync_axes=tuple(mesh.axis_names),
        )

    return run(params, h, enc_lengths, eos, max_steps)
