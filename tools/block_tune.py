#!/usr/bin/env python3
"""Decoder batch-block tuning on real hardware.

The fused attention scan's grid is (B/bb, T) with every cell
SEQUENTIAL, so the per-cell fill/drain tax scales with B/bb. Under
bf16 the VMEM-resident Vh/h blocks are 2-byte, so bb=64 looked like it
should fit the budget bb=32 fits at f32 — this tool measures the full
train step at forced block sizes (ATTN_SCAN_BLOCK_B). Result on v5e
(runs/block_tune.json): bb=64 bf16 FAILS TO COMPILE (the f32 step
intermediates blow the scoped-VMEM budget), so choose_block keeps 32.

Usage: python tools/block_tune.py --out runs/block_tune.json
"""

import argparse
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def measure(block_b, steps):
    os.environ["ATTN_SCAN_BLOCK_B"] = str(block_b)
    from tools.steptime import measure_train_step

    mk = dict(
        name="chorowski", input_frame_size=123, output_depth=62,
        feature_maps=0, filt_size=10, scan_unroll=8,
        compute_dtype="bfloat16",
        hidden_frame_size=256, output_frame_size=256, score_depth=512,
        state_depth=256, mlp_depth=64,
    )
    try:
        ms, loss = measure_train_step(mk, 128, 144, 48, steps)
        return {"block_b": block_b, "ms_per_step": round(ms, 3),
                "loss": round(loss, 4)}
    except Exception as e:
        return {"block_b": block_b, "error": f"{type(e).__name__}: {e}"[:300]}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--steps", type=int, default=40)
    ap.add_argument("--blocks", default="32,64")
    args = ap.parse_args()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rows = []
    for bb in [int(x) for x in args.blocks.split(",")]:
        # fresh subprocess per block: the env override must be set
        # before the jit cache sees the shape
        r = subprocess.run(
            [sys.executable, "-c",
             f"import sys; sys.path.insert(0, {repo!r}); "
             f"from tools.block_tune import measure; import json; "
             f"print('ROW ' + json.dumps(measure({bb}, {args.steps})))"],
            capture_output=True, text=True, timeout=3000,
            env={**os.environ, "TPU_CHIP_LEASE_FORCE": "1"},
        )
        row = None
        for line in r.stdout.splitlines():
            if line.startswith("ROW "):
                row = json.loads(line[4:])
        if row is None:
            row = {"block_b": bb,
                   "error": (r.stdout[-300:] + r.stderr[-300:])[-400:]}
        rows.append(row)
        print(row, flush=True)

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump({"shape": {"b": 128, "l": 144, "t": 48,
                             "dtype": "bfloat16"}, "rows": rows}, f, indent=1)
    print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    # one chip client at a time (CLAUDE.md; utils/lease.py). Subprocesses
    # force-skip the lease (the parent holds it).
    from seq2seq_attention_asr_tpu.utils.lease import chip_lease

    with chip_lease("block_tune.py"):
        main()
