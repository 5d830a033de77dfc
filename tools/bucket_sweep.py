#!/usr/bin/env python3
"""Bucketing-config sweep for the realistic-mix benchmark (VERDICT r2
Weak #4: the 2-bucket config loses ~36% of train throughput to padding
with nothing measuring what finer buckets would recover).

For each batcher config this measures, on the SAME TIMIT-like utterance
mix bench.py uses:
  - padding waste: 1 - real_audio / padded_audio (frames the chip
    computes that carry no audio)
  - device throughput in real audio-s/s (every distinct padded shape
    pre-compiled, batches device-resident — the bench methodology)
  - the compile count (distinct (L_pad, T_pad) shapes) each config
    costs, since every full-train-step compile is minutes over the
    axon tunnel

Writes runs/bucket_sweep.json; bench.py adopts the winner.

Usage: python tools/bucket_sweep.py --out runs/bucket_sweep.json
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

HOP, SR = 512, 16000.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--small", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from seq2seq_attention_asr_tpu.data import batching, timit as timit_data
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
    model = registry.build(
        "chorowski", input_frame_size=123, output_depth=62,
        feature_maps=0, filt_size=10, scan_unroll=8,
        compute_dtype="float32" if args.small else "bfloat16", **dims,
    )
    tcfg = trainer_lib.TrainConfig(normalize_nll=True)
    ocfg = optim_lib.OptimConfig(colnorm=True, colnorm_maxval=1.0)
    tx = optim_lib.build_optimizer(ocfg)
    init_fn, step_fn = trainer_lib.make_train_step(
        model.forward, tx, ocfg, tcfg, 62
    )
    step_jit = jax.jit(step_fn, donate_argnums=0)

    # the bench.py realistic mix: TIMIT-like length distribution
    b = args.batch
    rng = np.random.RandomState(0)
    # 2048 utts so even 4-L-bucket configs fill b=128 batches (at 512,
    # drop_remainder left half the buckets unmeasured — r3 sweep v1).
    # Feature VALUES don't affect step time, so x is synthesized on
    # device per batch (random normal at the padded shape) and only
    # the tiny length/label arrays cross the tunnel.
    n_utts = 2048
    lens = np.clip(rng.normal(110, 25, n_utts).astype(int), 40, 144)
    tlens = np.maximum(lens // 3, 4)
    ds = timit_data.Dataset(
        uids=[f"b{i}" for i in range(n_utts)],
        x=[np.zeros((li, 1), np.float32) for li in lens],  # shape carrier
        y=[rng.randint(0, 62, ti).astype(np.int32) for ti in tlens],
        y39=None, start=[None] * n_utts, finish=[None] * n_utts,
    )

    # every L boundary 16-aligned: the fused bf16 train kernel requires
    # L %% 16 (CLAUDE.md bf16-tile note) — v1 of this sweep used 104 and
    # those batches silently fell back to the (slower) XLA path
    configs = [
        ("2xL t64 (r2 bench)", dict(l_buckets=[96, 144], t_multiple=64),
         False),
        ("2xL t32", dict(l_buckets=[96, 144], t_multiple=32), False),
        ("4xL t32", dict(l_buckets=[80, 112, 128, 144], t_multiple=32),
         False),
        ("4xL t16", dict(l_buckets=[80, 112, 128, 144], t_multiple=16),
         False),
        ("2xL t32 sorted", dict(l_buckets=[96, 144], t_multiple=32), True),
        ("4xL t16 sorted", dict(l_buckets=[80, 112, 128, 144],
                                t_multiple=16), True),
    ]
    rows = []
    # hoisted out of the config loop: rebuilding the jit per config
    # would discard its cache and recompile the feature-synth kernel
    # for every row (wasteful on the tunneled chip)
    mk_x = jax.jit(
        lambda k, s: jax.random.normal(k, s, jnp.float32),
        static_argnums=1,
    )
    key = jax.random.PRNGKey(7)
    for name, kw, sorted_ in configs:
        batcher = batching.BucketedBatcher(batch_size=b, **kw)
        use = ds
        if sorted_:
            # length-sorted feed: batches fill with like-length
            # utterances so the per-batch T pad is tight. (For real
            # TRAINING this correlates batch contents; standard use is
            # shuffle-within-bucket — this row only quantifies the
            # padding headroom sortedness buys.)
            order = np.argsort([len(x) for x in ds.x])
            import dataclasses

            use = dataclasses.replace(
                ds,
                uids=[ds.uids[i] for i in order],
                x=[ds.x[i] for i in order],
                y=[ds.y[i] for i in order],
                y39=None,
                start=[None] * n_utts, finish=[None] * n_utts,
            )
        dev_batches, real_audio, padded_audio = [], 0.0, 0.0
        shapes = set()
        for bi, bt in enumerate(batcher.batches(use, drop_remainder=True)):
            real_audio += float(bt.x_len.sum()) * HOP / SR
            padded_audio += bt.x.shape[0] * bt.x.shape[1] * HOP / SR
            shapes.add((bt.x.shape[1], bt.y.shape[1]))
            dev_batches.append((
                mk_x(jax.random.fold_in(key, bi),
                     (bt.x.shape[0], bt.x.shape[1], 123)),
                jnp.asarray(bt.x_len),
                jnp.asarray(bt.y), jnp.asarray(bt.dec_mask),
            ))
        state = init_fn(model.init(jax.random.PRNGKey(0)),
                        jax.random.PRNGKey(1))
        for db in dev_batches:  # compile each shape + warmup
            state, m = step_jit(state, db)
        float(m["loss"])
        t0 = time.perf_counter()
        for _ in range(args.reps):
            for db in dev_batches:
                state, m = step_jit(state, db)
        float(m["loss"])
        dt = time.perf_counter() - t0
        row = {
            "config": name,
            "compiled_shapes": len(shapes),
            "padding_waste": round(1.0 - real_audio / padded_audio, 4),
            "audio_s_per_s": round(real_audio * args.reps / dt, 2),
            "n_batches": len(dev_batches),
        }
        rows.append(row)
        print(row, flush=True)

    rows.sort(key=lambda r: -r["audio_s_per_s"])
    blob = {
        "methodology": (
            "bench.py realistic-mix corpus (TIMIT-like N(110,25) frame "
            "lengths, clipped 40-144); full bf16 train steps, batches "
            "device-resident, every distinct shape pre-compiled; "
            "throughput counts REAL audio seconds only"
        ),
        "batch_size": b,
        "results_by_throughput": rows,
    }
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(blob, f, indent=1)
    print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    # one chip client at a time (CLAUDE.md; utils/lease.py)
    from seq2seq_attention_asr_tpu.utils.lease import chip_lease

    with chip_lease("bucket_sweep.py"):
        main()
