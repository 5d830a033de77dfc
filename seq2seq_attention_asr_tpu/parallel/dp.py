"""Composed data-parallel x sequence-sharded training step.

The distributed training capability the reference lacks entirely
(SURVEY.md §2.6): batches shard over the mesh "dp" axis (XLA inserts
the gradient psum over ICI automatically because params are replicated
and the batch is sharded), and — when the mesh has an "sp" axis — the
decoder's attention over encoder states runs sequence-sharded via
shard_map (parallel/seq_attention.py).

Usage:
    mesh = make_mesh(dp=4, sp=2)
    step = make_sharded_train_step(model, tx, tcfg, ocfg, mesh)
    state = init(...); state, metrics = step(state, batch_arrays)
"""

from __future__ import annotations

import jax
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
