"""Shared train-step timing harness for the perf tools.

Encapsulates the CLAUDE.md timing rules in ONE place (bf16_cliff.py and
block_tune.py previously each carried a copy): steps chain through the
DONATED train state so the device must run them sequentially, and the
only host sync is one final metric read — per-step reads would add a
host<->device round trip per step, and on the tunneled chip
`block_until_ready` returns early so a value read is the only
trustworthy sync.
"""

from __future__ import annotations

import time

import numpy as np


def measure_train_step(model_kwargs, b, l, t_len, steps, warmup=3, seed=0):
    """Time the full reference-recipe train step (fwd+bwd+adadelta+
    colnorm) at the given shape. Returns (ms_per_step, final_loss).
    Raises on compile/execution failure (callers record the error)."""
    import jax
    import jax.numpy as jnp

    from seq2seq_attention_asr_tpu.models import registry
    from seq2seq_attention_asr_tpu.train import optim as optim_lib
    from seq2seq_attention_asr_tpu.train import trainer as trainer_lib

    model = registry.build(**model_kwargs)
    tcfg = trainer_lib.TrainConfig(normalize_nll=True)
    ocfg = optim_lib.OptimConfig(colnorm=True, colnorm_maxval=1.0)
    tx = optim_lib.build_optimizer(ocfg)
    init_fn, step_fn = trainer_lib.make_train_step(
        model.forward, tx, ocfg, tcfg, model.output_depth
    )
    step_jit = jax.jit(step_fn, donate_argnums=0)

    rng = np.random.RandomState(seed)
    v = model.output_depth
    x = jnp.asarray(rng.randn(b, l, model.cfg.input_frame_size), jnp.float32)
    x_len = jnp.asarray(np.full(b, l, np.int32))
    y = jnp.asarray(rng.randint(0, v, (b, t_len)))
    dm = jnp.ones((b, t_len), jnp.float32)
    batch = (x, x_len, y, dm)
    state = init_fn(model.init(jax.random.PRNGKey(0)), jax.random.PRNGKey(1))

    for _ in range(warmup):
        state, m = step_jit(state, batch)
    float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(steps):
        state, m = step_jit(state, batch)
    loss = float(m["loss"])  # the one sync proving the chain executed
    ms = (time.perf_counter() - t0) / steps * 1e3
    return ms, loss
