#!/usr/bin/env python3
"""Chipless TPU compile check for the fused attention kernels.

Interpret-mode parity tests cannot catch Mosaic LOWERING failures
(CLAUDE.md: bf16 shape-cast/minor-expand restrictions only surface in
the real compiler). The axon terminal's remote_compile endpoint runs a
chipless AOT TpuAotCompiler, so `jit(...).lower().compile()` validates
lowering WITHOUT taking the chip lease or executing anything.

Compiles fwd+bwd of the fused decoder scan for every kernel variant
(fm 0/6 x cell gru/lstm) in bf16 AND f32 at small-but-tile-legal
shapes, plus the fused decode step via beam_search.

Usage: python tools/tpu_compile_check.py
"""

import functools
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from seq2seq_attention_asr_tpu.decode import beam as beam_lib
    from seq2seq_attention_asr_tpu.ops import attention as att

    failures = []
    b, l, t, v = 16, 16, 4, 7
    for cell in ("gru", "lstm"):
        for fm in (0, 6):
            for dtn, dtype in (("bf16", jnp.bfloat16), ("f32", jnp.float32)):
                cfg = att.AttentionConfig(
                    score_depth=32, filt_size=5, feature_maps=fm,
                    state_depth=16, annotation_depth=32, output_depth=v,
                    readout=(("maxout", 12, 7), ("linear", v)), cell=cell,
                    mono_align=False, penalty_lambda=0.0,
                )
                params = jax.tree.map(
                    lambda a: a.astype(dtype),
                    att.attention_init(jax.random.PRNGKey(0), cfg),
                )
                rng = np.random.RandomState(0)
                h = jnp.asarray(rng.randn(b, l, 32), dtype)
                enc_len = jnp.asarray([l] * b)
                oh = jax.nn.one_hot(
                    jnp.asarray(rng.randint(0, v, (b, t))), v, dtype=dtype
                )
                dm = jnp.ones((b, t), dtype)

                def loss(p):
                    out = att.decode_teacher_forced(
                        p, cfg, h, enc_len, oh, dm, backend="pallas"
                    )
                    per = -jnp.sum(oh * out["logprobs"], axis=-1) * dm
                    return jnp.mean(jnp.sum(per.astype(jnp.float32), -1))

                name = f"scan {cell} fm={fm} {dtn}"
                try:
                    jax.jit(jax.grad(loss)).lower(params).compile()
                    print(f"OK   {name}", flush=True)
                except Exception as e:
                    failures.append((name, str(e)[:400]))
                    print(f"FAIL {name}: {str(e)[:200]}", flush=True)

                name = f"step {cell} fm={fm} {dtn}"
                try:
                    fn = functools.partial(
                        beam_lib.beam_search, cfg=cfg, eos_id=2, k=3,
                        max_steps_cap=l, backend="pallas",
                    )
                    jax.jit(
                        lambda p, hh, ln: fn(
                            p, h=hh, enc_lengths=ln,
                            max_steps=jnp.minimum(ln, l),
                        )
                    ).lower(params, h, enc_len).compile()
                    print(f"OK   {name}", flush=True)
                except Exception as e:
                    failures.append((name, str(e)[:400]))
                    print(f"FAIL {name}: {str(e)[:200]}", flush=True)

    # bigru / bilstm fused encoder scans, both nsplit paths
    from seq2seq_attention_asr_tpu.ops import rnn

    for layer, init in (("bigru", rnn.bigru_init), ("bilstm", rnn.bilstm_init)):
        for bb in (16, 32):  # ns=1 and ns=2 (gru_scan._nsplit)
            for dtn, dtype in (("bf16", jnp.bfloat16), ("f32", jnp.float32)):
                p = jax.tree.map(
                    lambda a: a.astype(dtype),
                    init(jax.random.PRNGKey(0), 24, 128),
                )
                x = jnp.zeros((bb, 16, 24), dtype)
                lens = jnp.full((bb,), 16)

                def loss(pp, xx):
                    out = rnn.bigru_layer(pp, xx, lens, backend="pallas") \
                        if layer == "bigru" else \
                        rnn.bilstm_layer(pp, xx, lens, backend="pallas")
                    return jnp.sum(out.astype(jnp.float32))

                name = f"{layer} b={bb} {dtn}"
                try:
                    jax.jit(jax.grad(loss, argnums=(0, 1))).lower(p, x).compile()
                    print(f"OK   {name}", flush=True)
                except Exception as e:
                    failures.append((name, str(e)[:400]))
                    print(f"FAIL {name}: {str(e)[:200]}", flush=True)

    if failures:
        print(f"\n{len(failures)} FAILURES")
        sys.exit(1)
    print("\nall kernel variants compile")


if __name__ == "__main__":
    main()
