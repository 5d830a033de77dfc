#!/usr/bin/env python3
"""Flagship batch-scaling curve (VERDICT r4 next-round #1b).

docs/PERF.md's decomposition says the fused decoder scan step is
latency-dominated (~14 us/step of MXU fill/drain + VPU tax vs ~2 us of
matmul). If that is the bottleneck, doubling the batch should be nearly
free in step time — i.e. audio-s/s should scale ~linearly in b until
the MXU saturates or VMEM blocks stop fitting. This measures the full
reference-recipe train step (fwd+bwd+adadelta+colnorm, bf16 flagship
dims, bench.py shapes L=144/T=56) at b in {32..512}.

Usage: python tools/batch_scaling.py [--out runs/batch_scaling.json]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from steptime import measure_train_step  # noqa: E402

HOP, SR = 512, 16000  # bench.py's frame accounting (32 ms/frame)
L, T = 144, 56

FLAGSHIP = dict(
    name="chorowski", input_frame_size=123, hidden_frame_size=256,
    output_frame_size=256, score_depth=512, state_depth=256, mlp_depth=64,
    output_depth=62, feature_maps=0, filt_size=10, mono_align=True,
    penalty_lambda=0.0, scan_unroll=8, compute_dtype="bfloat16",
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="runs/batch_scaling.json")
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--batches", default="32,64,128,256,512")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from seq2seq_attention_asr_tpu.utils.lease import chip_lease

    rows = []
    with chip_lease("batch_scaling.py"):
        import jax

        for b in [int(s) for s in args.batches.split(",")]:
            try:
                ms, loss = measure_train_step(FLAGSHIP, b, L, T, args.steps)
            except Exception as e:  # compile failure at huge b is data too
                rows.append({"b": b, "error": str(e)[:300]})
                print(f"b={b}: FAILED {str(e)[:120]}", flush=True)
                continue
            aps = b * L * HOP / SR / (ms / 1e3)
            rows.append({"b": b, "ms_per_step": round(ms, 3),
                         "audio_s_per_s": round(aps, 1)})
            print(f"b={b}: {ms:.2f} ms/step -> {aps:,.0f} audio-s/s",
                  flush=True)
        out = {"backend": jax.default_backend(), "L": L, "T": T,
               "model": "flagship bf16 (bench dims)", "rows": rows}
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
