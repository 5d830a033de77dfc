"""Composed data-parallel x sequence-sharded train/eval/decode steps.

The distributed training capability the reference lacks entirely
(SURVEY.md §2.6): batches shard over the mesh "dp" axis (XLA inserts
the gradient psum over ICI automatically because params are replicated
and the batch is sharded), and — when the mesh has an "sp" axis — the
decoder's attention over encoder states runs sequence-sharded via
shard_map (parallel/seq_attention.py).

Usage (or hand the mesh to train.trainer.Trainer, which wires all
three steps plus checkpointing/data into the epoch driver):
    mesh = make_mesh(dp=4, sp=2)
    step = make_sharded_train_step(model, tx, tcfg, ocfg, mesh)
    state = init(...); state, metrics = step(state, batch_arrays)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from ..train import optim as optim_lib
from ..train import trainer as trainer_lib
from ..train.trainer import TrainConfig
from . import seq_attention
from .mesh import DATA_AXIS, SEQ_AXIS, batch_sharding, replicated


def make_sharded_forward(model, mesh):
    """forward(params, x, x_len, onehot, dec_mask, *, dropout_rng,
    train) -> out dict, with the decoder sequence-sharded when the mesh
    has sp > 1. Matches the forward_fn contract of
    trainer.make_step_core, so the sharded step reuses the exact
    single-chip loss/grad/update core."""
    use_sp = mesh.shape[SEQ_AXIS] > 1

    def forward(params, x, x_len, onehot, dec_mask, *, dropout_rng=None,
                train=False):
        if not use_sp:
            return model.forward(
                params, x, x_len, onehot, dec_mask,
                dropout_rng=dropout_rng, train=train,
            )
        h, h_len = model.encode(params, x, x_len)
        h = jax.lax.with_sharding_constraint(
            h, NamedSharding(mesh, P(DATA_AXIS, SEQ_AXIS, None))
        )
        return seq_attention.sharded_decode_teacher_forced(
            mesh, params["decoder"], model.attention_cfg,
            h, h_len, onehot, dec_mask,
            dropout_rng=dropout_rng, train=train,
        )

    return forward


def make_sharded_train_step(
    model, tx: optax.GradientTransformation, tcfg: TrainConfig,
    ocfg: optim_lib.OptimConfig, mesh,
):
    """Jitted (train_params, opt_state, rng), batch -> new state + metrics.

    This is trainer.make_step_core — the SAME code object the
    single-chip step runs, including AWN / fixed weight noise sampling,
    dropout rng handling, the monotonic-penalty report, and the
    column-norm projection — wrapped in jit with dp-sharded batches and
    replicated state. XLA inserts the gradient psum over ICI because
    params are replicated while the batch is sharded. AWNState /
    opt-state pytrees are replicated leaf-wise by the same spec.
    """
    forward = make_sharded_forward(model, mesh)
    step = trainer_lib.make_step_core(
        forward, tx, ocfg, tcfg, model.output_depth
    )
    rep = replicated(mesh)
    bsh = batch_sharding(mesh)
    state_sh = (rep, rep, rep)
    return jax.jit(
        step,
        in_shardings=(state_sh, (bsh, bsh, bsh, bsh)),
        out_shardings=(state_sh, rep),
        donate_argnums=0,
    )


def make_sharded_eval_step(model, mesh):
    """Jitted teacher-forced eval over a dp-sharded batch: the same
    metric sums as trainer.make_eval_step (GSPMD reduces them globally),
    with the decoder sequence-sharded when the mesh has sp > 1."""
    forward = make_sharded_forward(model, mesh)
    eval_fn = trainer_lib.make_eval_step(forward, model.output_depth)
    rep, bsh = replicated(mesh), batch_sharding(mesh)
    return jax.jit(
        eval_fn,
        in_shardings=(rep, (bsh, bsh, bsh, bsh)),
        out_shardings=rep,
    )


def make_sharded_decode_step(
    model, mesh, beam_k: int, len_factor: float = 1.0,
    compute_dtype: str = "float32",
):
    """Jitted beam-search decode over a dp-sharded batch (SURVEY.md
    §2.6(d)): beam bookkeeping replicated over "sp", encoder annotations
    sequence-sharded when sp > 1 (the padded L must divide sp). Outputs
    come back REPLICATED so every host of a multi-controller run can
    read the full result (the all-gather rides ICI inside the jit).

    Same contract as trainer.make_decode_step: decode_fn(params, x,
    x_len, eos_id, max_steps_cap)."""
    from ..decode import beam as beam_lib

    use_sp = mesh.shape[SEQ_AXIS] > 1
    dt = jnp.dtype(compute_dtype)
    rep, bsh = replicated(mesh), batch_sharding(mesh)

    def decode_fn(params, x, x_len, eos_id, max_steps_cap: int):
        if dt != jnp.float32:
            cast = lambda a: a.astype(dt) if a.dtype == jnp.float32 else a
            params = jax.tree.map(cast, params)
            x = cast(x)
        h, h_len = model.encode(params, x, x_len)
        max_steps = jnp.minimum(
            (len_factor * h_len).astype(jnp.int32), max_steps_cap
        )
        if use_sp:
            h = jax.lax.with_sharding_constraint(
                h, NamedSharding(mesh, P(DATA_AXIS, SEQ_AXIS, None))
            )
            return seq_attention.sharded_beam_search(
                mesh, params["decoder"], model.attention_cfg, h, h_len,
                eos_id, k=beam_k, max_steps=max_steps,
                max_steps_cap=max_steps_cap,
            )
        return beam_lib.beam_search(
            params["decoder"], model.attention_cfg, h, h_len, eos_id,
            k=beam_k, max_steps=max_steps, max_steps_cap=max_steps_cap,
        )

    jitted = jax.jit(
        decode_fn,
        in_shardings=(rep, bsh, bsh, bsh),
        out_shardings=rep,
        static_argnums=(4,),
    )
    # pjit rejects kwargs when in_shardings is given; keep the
    # trainer-facing kwarg signature via a positional forwarder
    return lambda params, x, x_len, eos_id, max_steps_cap: jitted(
        params, x, x_len, eos_id, max_steps_cap
    )
