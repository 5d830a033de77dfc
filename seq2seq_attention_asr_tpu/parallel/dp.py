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

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from ..train import optim as optim_lib
from ..train.loss import token_accuracy
from ..train.trainer import TrainConfig, _one_hot_labels
from . import seq_attention
from .mesh import DATA_AXIS, SEQ_AXIS, batch_sharding, replicated


def make_sharded_forward(model, mesh):
    """forward(params, x, x_len, onehot, dec_mask) -> out dict, with the
    decoder sequence-sharded when the mesh has sp > 1."""
    use_sp = mesh.shape[SEQ_AXIS] > 1

    def forward(params, x, x_len, onehot, dec_mask):
        h, h_len = model.encode(params, x, x_len)
        if not use_sp:
            return model.forward(params, x, x_len, onehot, dec_mask, train=True)
        h = jax.lax.with_sharding_constraint(
            h, NamedSharding(mesh, P(DATA_AXIS, SEQ_AXIS, None))
        )
        return seq_attention.sharded_decode_teacher_forced(
            mesh, params["decoder"], model.attention_cfg,
            h, h_len, onehot, dec_mask,
        )

    return forward


def make_sharded_train_step(
    model, tx: optax.GradientTransformation, tcfg: TrainConfig,
    ocfg: optim_lib.OptimConfig, mesh,
):
    """Jitted (params, opt_state, rng), batch -> new state + metrics.

    Noise variants are omitted here for clarity of the sharded path;
    compose AWN by sampling outside (the state pytrees shard the same
    way).
    """
    forward = make_sharded_forward(model, mesh)

    def loss_fn(params, x, x_len, onehot, dec_mask):
        out = forward(params, x, x_len, onehot, dec_mask)
        per_step = -jnp.sum(onehot * out["logprobs"], axis=-1) * dec_mask
        per_utt = jnp.sum(per_step, axis=-1)
        if tcfg.normalize_nll:
            per_utt = per_utt / jnp.maximum(jnp.sum(dec_mask, axis=-1), 1.0)
        return jnp.mean(per_utt), out

    def step(state, batch):
        params, opt_state, rng = state
        x, x_len, y, dec_mask = batch
        rng, _ = jax.random.split(rng)
        onehot = _one_hot_labels(y, dec_mask, model.output_depth)
        (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, x, x_len, onehot, dec_mask
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        if ocfg.colnorm:
            params = optim_lib.colnorm_project(params, ocfg.colnorm_maxval)
        correct, total = token_accuracy(out["logprobs"], y, dec_mask)
        metrics = {
            "nll": loss,
            "grad_norm": optax.global_norm(grads),
            "correct": correct,
            "total": total,
        }
        return (params, opt_state, rng), metrics

    rep = replicated(mesh)
    bsh = batch_sharding(mesh)
    state_sh = (rep, rep, rep)
    return jax.jit(
        step,
        in_shardings=(state_sh, (bsh, bsh, bsh, bsh)),
        out_shardings=(state_sh, rep),
        donate_argnums=0,
    )
