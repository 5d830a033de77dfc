#!/usr/bin/env python3
"""Cost of sequence sharding (VERDICT r4 next-round #4).

The fused Pallas kernels (decoder scan + GRU scan) bail when
`axis_name` is set (ops/attention.py fused gate, decode/beam.py), so
the sp>1 path runs the XLA lax.scan everywhere. Multi-chip hardware is
not reachable here, but the single-chip fused-vs-XLA delta at the
flagship shape IS measurable and bounds the per-chip compute cost an
sp shard pays before collectives are even counted (each sp shard also
runs the decoder recurrence over the FULL T steps — sequence sharding
splits L, not T).

Measures the full train step (fwd+bwd+adadelta+colnorm, bf16 flagship)
with rnn/attn backends auto (fused) vs xla at L in {144 (sp=1 global),
72 (the L-local an sp=2 shard sees), 48 (sp=3)}.

Usage: python tools/sp_cost.py [--out runs/sp_cost.json]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from steptime import measure_train_step  # noqa: E402

HOP, SR = 512, 16000  # bench.py's frame accounting (32 ms/frame)
B, T = 128, 56

BASE = dict(
    name="chorowski", input_frame_size=123, hidden_frame_size=256,
    output_frame_size=256, score_depth=512, state_depth=256, mlp_depth=64,
    output_depth=62, feature_maps=0, filt_size=10, mono_align=True,
    penalty_lambda=0.0, scan_unroll=8, compute_dtype="bfloat16",
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="runs/sp_cost.json")
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from seq2seq_attention_asr_tpu.utils.lease import chip_lease

    rows = []
    with chip_lease("sp_cost.py"):
        import jax

        # 16-aligned lengths only: L=72 (the raw sp=2 local length of a
        # 144-frame batch) fails the bf16 fused gate and silently runs
        # the XLA scan — sp shards must pad local L to %16 (here 80),
        # exactly like bucket boundaries (CLAUDE.md).
        for l in (144, 80, 48):
            for be in ("auto", "xla"):
                kw = dict(BASE, rnn_backend=be, attn_backend=be)
                try:
                    ms, _ = measure_train_step(kw, B, l, T, args.steps)
                except Exception as e:
                    rows.append({"L": l, "backend": be,
                                 "error": str(e)[:300]})
                    print(f"L={l} {be}: FAILED {str(e)[:120]}", flush=True)
                    continue
                aps = B * l * HOP / SR / (ms / 1e3)
                rows.append({"L": l, "backend": be,
                             "ms_per_step": round(ms, 3),
                             "audio_s_per_s": round(aps, 1)})
                print(f"L={l} {be}: {ms:.2f} ms/step "
                      f"({aps:,.0f} audio-s/s)", flush=True)
        out = {"backend": jax.default_backend(), "B": B, "T": T,
               "rows": rows}
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
