#!/usr/bin/env python3
"""bf16 small-batch cliff measurement (VERDICT r3 next-round #7).

CLAUDE.md once recorded the fused bf16 train kernels as SLOW at batch
32 (25 ms/step vs 4.2 ms f32 fused at b=32, L=80). This sweep measures
the full train step across (compute_dtype, kernel backend, penalty) x
(batch, L) so `backend="auto"` can be guarded if bf16-fused ever loses
— the r4 run (runs/bf16_cliff.json) showed the cliff is GONE (bf16
fused wins at every measured shape), so no guard is installed; re-run
this before re-introducing one.

The penalty rows measure the monotonic-penalty cost on the fused path
(VERDICT r3 next-round #5) at the flagship bench shape.

Usage: python tools/bf16_cliff.py --out runs/bf16_cliff.json [--cpu --small]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tools.steptime import measure_train_step  # noqa: E402


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

    dims = (
        dict(hidden_frame_size=32, output_frame_size=32, score_depth=64,
             state_depth=32, mlp_depth=16)
        if args.small
        else dict(hidden_frame_size=256, output_frame_size=256,
                  score_depth=512, state_depth=256, mlp_depth=64)
    )
    # (dtype, backend, penalty_lambda, shapes). Kept lean: every
    # (variant, shape) is a fresh full-train-step compile and compiles
    # cost minutes over the tunnel.
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
    for dt_name, backend, plam, vshapes in variants:
        mk = dict(
            name="chorowski", input_frame_size=123, output_depth=62,
            feature_maps=0, filt_size=10, scan_unroll=8,
            penalty_lambda=plam,
            compute_dtype="bfloat16" if dt_name == "bf16" else "float32",
            rnn_backend=backend, attn_backend=backend, **dims,
        )
        for b, l in vshapes:
            t_len = max(l // 3 // 16 * 16, 16)
            row = {"dtype": dt_name, "backend": backend, "penalty": plam,
                   "b": b, "l": l, "t": t_len}
            try:
                ms, _ = measure_train_step(mk, b, l, t_len, args.steps)
                row["ms_per_step"] = round(ms, 3)
            except Exception as e:  # shape unsupported on this path
                row["error"] = f"{type(e).__name__}: {e}"[:200]
            rows.append(row)
            print(row, flush=True)

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump({
            "methodology": (
                "tools/steptime.py harness: full train step (fwd+bwd+"
                "adadelta+colnorm), donated-state chaining, final-loss "
                "sync; chorowski recipe dims; backend forces BOTH "
                "rnn_backend and attn_backend"
            ),
            "rows": rows,
        }, f, indent=1)
    print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    # one chip client at a time (CLAUDE.md; utils/lease.py)
    from seq2seq_attention_asr_tpu.utils.lease import chip_lease

    with chip_lease("bf16_cliff.py"):
        main()
