#!/usr/bin/env python3
"""bf16 small-batch cliff measurement (VERDICT r3 next-round #7).

CLAUDE.md records that the fused bf16 train kernels are SLOW at batch
32 (25 ms/step vs 4.2 ms f32 fused at b=32, L=80) while being the
clear winner at b=128. This sweep measures the full train step across
(compute_dtype, kernel backend) x (batch, L) so `backend="auto"` can
refuse bf16-fused at shapes where it loses, instead of letting users
hit the cliff silently.

Rows: ms/step for {f32-pallas, f32-xla, bf16-pallas, bf16-xla} at each
shape. Writes JSON; the chosen auto-path guard cites this file.

Usage: python tools/bf16_cliff.py --out runs/bf16_cliff.json [--cpu --small]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--small", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from seq2seq_attention_asr_tpu.models import registry
    from seq2seq_attention_asr_tpu.train import optim as optim_lib
    from seq2seq_attention_asr_tpu.train import trainer as trainer_lib

    dims = (
        dict(hidden_frame_size=32, output_frame_size=32, score_depth=64,
             state_depth=32, mlp_depth=16)
        if args.small
        else dict(hidden_frame_size=256, output_frame_size=256,
                  score_depth=512, state_depth=256, mlp_depth=64)
    )
    shapes = None  # every variant lists its shapes explicitly
    # (dtype, backend, penalty_lambda, shapes). Kept lean: every
    # (variant, shape) is a fresh full-train-step compile and compiles
    # cost minutes over the tunnel. The penalty rows measure the
    # monotonic-penalty cost on the fused path (VERDICT r3 next-round
    # #5: recipes with monoAlign need a published operating point).
    variants = [
        ("f32", "pallas", 0.0, [(32, 80), (64, 80)]),
        ("bf16", "pallas", 0.0, [(32, 80), (64, 80), (128, 144)]),
        ("bf16", "xla", 0.0, [(32, 80), (128, 144)]),
        ("bf16", "pallas", 0.1, [(128, 144)]),
        ("bf16", "xla", 0.1, [(128, 144)]),
        ("f32", "pallas", 0.1, [(32, 80)]),
    ]
    if args.cpu:  # smoke: one shape, fewer steps
        args.steps = 2
        variants = [v[:3] + ([(32, 80)],) for v in variants[:2]]

    rows = []
    rng = np.random.RandomState(0)
    for dt_name, backend, plam, vshapes in variants:
        model = registry.build(
            "chorowski", input_frame_size=123, output_depth=62,
            feature_maps=0, filt_size=10, scan_unroll=8,
            penalty_lambda=plam,
            compute_dtype="bfloat16" if dt_name == "bf16" else "float32",
            rnn_backend=backend, attn_backend=backend, **dims,
        )
        tcfg = trainer_lib.TrainConfig(normalize_nll=True)
        ocfg = optim_lib.OptimConfig(colnorm=True, colnorm_maxval=1.0)
        tx = optim_lib.build_optimizer(ocfg)
        init_fn, step_fn = trainer_lib.make_train_step(
            model.forward, tx, ocfg, tcfg, 62
        )
        step_jit = jax.jit(step_fn, donate_argnums=0)
        for b, l in (vshapes or shapes):
            t_len = max(l // 3 // 16 * 16, 16)
            x = jnp.asarray(rng.randn(b, l, 123), jnp.float32)
            x_len = jnp.asarray(np.full(b, l, np.int32))
            y = jnp.asarray(rng.randint(0, 62, (b, t_len)))
            dm = jnp.ones((b, t_len), jnp.float32)
            batch = (x, x_len, y, dm)
            state = init_fn(model.init(jax.random.PRNGKey(0)),
                            jax.random.PRNGKey(1))
            try:
                for _ in range(3):
                    state, m = step_jit(state, batch)
                float(m["loss"])
                t0 = time.perf_counter()
                for _ in range(args.steps):
                    state, m = step_jit(state, batch)
                float(m["loss"])
                ms = (time.perf_counter() - t0) / args.steps * 1e3
            except Exception as e:  # shape unsupported on this path
                ms, err = None, f"{type(e).__name__}: {e}"[:200]
                rows.append({"dtype": dt_name, "backend": backend,
                             "penalty": plam, "b": b, "l": l,
                             "t": t_len, "error": err})
                print(rows[-1], flush=True)
                continue
            rows.append({"dtype": dt_name, "backend": backend,
                         "penalty": plam, "b": b, "l": l, "t": t_len,
                         "ms_per_step": round(ms, 3)})
            print(rows[-1], flush=True)

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump({
            "methodology": (
                "full train step (fwd+bwd+adadelta+colnorm), donated-state "
                "chaining, final-loss sync; chorowski recipe dims; "
                "backend forces BOTH rnn_backend and attn_backend"
            ),
            "rows": rows,
        }, f, indent=1)
    print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    # one chip client at a time (CLAUDE.md; utils/lease.py)
    from seq2seq_attention_asr_tpu.utils.lease import chip_lease

    with chip_lease("bf16_cliff.py"):
        main()
