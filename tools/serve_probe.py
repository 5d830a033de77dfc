#!/usr/bin/env python3
"""Serve-latency probe — root-cause harness for the r3->r4 serving
regression (VERDICT r4 Weak #1 / next-round #2: exact=False p50 b=1
82.4->92.6 ms, b=8 143.6->178.6, b=128 1100->1830 with no serve-path
diff in the bench itself).

Measures the SAME Transcriber pipeline as bench.py's serving section in
a fresh process, in controlled variants, separating tree effects from
bench process-state effects:

  fresh       exact=False, b in {1,8,128} — bench r3's conditions
              (serve measured before any second Transcriber existed)
  exact       exact=True, b in {1,8} (the r4 addition)
  post_exact  RE-measure the first Transcriber after the exact one has
              compiled + run — r4's interleaving/process-state
  xla_beam    exact=False with the fused step kernel disabled
              (beam backend="xla"), b in {1,8} — kernel-selection delta

Usage: python tools/serve_probe.py [--reps 7] [--out runs/serve_probe.json]
"""

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def _measure(tr, pcms, reps):
    tr.transcribe(pcms)  # compile + warm
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        tr.transcribe(pcms)
        times.append((time.perf_counter() - t0) * 1e3)
    return round(float(np.median(times)), 2)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=7)
    ap.add_argument("--out", default="runs/serve_probe.json")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from seq2seq_attention_asr_tpu.utils.lease import chip_lease

    with chip_lease("serve_probe.py"):
        import jax

        from seq2seq_attention_asr_tpu import serve
        from seq2seq_attention_asr_tpu.models import registry

        # bench.py's flagship serving model, bit-for-bit
        model = registry.build(
            "chorowski", input_frame_size=123, hidden_frame_size=256,
            output_frame_size=256, score_depth=512, state_depth=256,
            mlp_depth=64, output_depth=62, feature_maps=0, filt_size=10,
            mono_align=True, penalty_lambda=0.0, scan_unroll=8,
            compute_dtype="bfloat16",
        )
        params = model.init(jax.random.PRNGKey(0))
        rng = np.random.RandomState(1)
        mk = lambda b: [rng.randn(int(16000 * 3.5)).astype(np.float32) * 0.1
                        for _ in range(b)]
        out = {"backend": jax.default_backend(), "reps": args.reps}

        tr = serve.Transcriber(
            model, params, eos_id=61, pad_frames=10, beam_k=5,
            frontend="pallas", exact=False, frame_bucket=16,
        )
        for b in (1, 8, 128):
            out[f"fresh_b{b}"] = _measure(tr, mk(b), args.reps)
            print(f"fresh b={b}: {out[f'fresh_b{b}']} ms", flush=True)

        tr_exact = serve.Transcriber(
            model, params, eos_id=61, pad_frames=10, beam_k=5,
            frontend="pallas", exact=True, frame_bucket=16,
        )
        for b in (1, 8):
            out[f"exact_b{b}"] = _measure(tr_exact, mk(b), args.reps)
            print(f"exact b={b}: {out[f'exact_b{b}']} ms", flush=True)

        for b in (1, 8, 128):
            out[f"post_exact_b{b}"] = _measure(tr, mk(b), args.reps)
            print(f"post_exact b={b}: {out[f'post_exact_b{b}']} ms",
                  flush=True)

        # kernel-selection delta: force the XLA scan beam step
        from seq2seq_attention_asr_tpu.decode import beam as beam_lib

        orig = beam_lib.beam_search
        serve.beam_lib.beam_search = functools.partial(orig, backend="xla")
        try:
            tr_x = serve.Transcriber(
                model, params, eos_id=61, pad_frames=10, beam_k=5,
                frontend="pallas", exact=False, frame_bucket=16,
            )
            for b in (1, 8):
                out[f"xla_beam_b{b}"] = _measure(tr_x, mk(b), args.reps)
                print(f"xla_beam b={b}: {out[f'xla_beam_b{b}']} ms",
                      flush=True)
        finally:
            serve.beam_lib.beam_search = orig

        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)
        print(json.dumps(out))


if __name__ == "__main__":
    main()
