#!/usr/bin/env python3
"""Convergence trajectory harness — records a beam-search PER curve for
the canonical Chorowski recipe (the north-star quality metric,
/root/reference/timit/timit.lua:397-415 + BASELINE.json).

Real TIMIT/LibriSpeech audio is not redistributable, so the harness
trains on the synthetic phone-emission task (data/synthetic.py) at
TIMIT-like dimensions: 123-dim frames, 40-phone vocabulary (+<EOS>),
variable phone durations — the same structure (monotonic alignment,
per-phone identity, EOS termination) the attention recipe must learn
on real speech. The PER here is a held-out-set beam-search PER, i.e.
generalization, not memorization.

Writes one JSON with the full per-epoch trajectory; committed runs live
in runs/ (e.g. runs/convergence_tpu.json).

Usage:
  python tools/convergence.py --out runs/convergence.json \
      [--epochs 40] [--train-utts 200] [--valid-utts 40] [--cpu] [--small]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--epochs", type=int, default=40)
    ap.add_argument("--train-utts", type=int, default=200)
    ap.add_argument("--valid-utts", type=int, default=40)
    ap.add_argument("--n-phones", type=int, default=40)
    ap.add_argument("--noise", type=float, default=0.35)
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--decode-every", type=int, default=2)
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument(
        "--small", action="store_true",
        help="quarter-size model for quick smoke runs",
    )
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax

    from seq2seq_attention_asr_tpu.data import batching, synthetic
    from seq2seq_attention_asr_tpu.models import registry
    from seq2seq_attention_asr_tpu.train import optim as optim_lib
    from seq2seq_attention_asr_tpu.train import trainer as trainer_lib

    train, valid, v = synthetic.train_valid(
        args.train_utts, args.valid_utts, n_phones=args.n_phones,
        feat_dim=123, min_len=6, max_len=16, frames_per_phone=(4, 9),
        noise=args.noise, seed=args.seed,
    )
    dims = (
        dict(hidden_frame_size=64, output_frame_size=64, score_depth=128,
             state_depth=64, mlp_depth=32)
        if args.small
        else dict(hidden_frame_size=256, output_frame_size=256,
                  score_depth=512, state_depth=256, mlp_depth=64)
    )
    # canonical recipe: content+state attention (featureMaps 0), GRU
    # decoder, maxout readout, adadelta(0.95, 1e-8), normalized NLL,
    # column-norm constraint (exp_logmel7_chorowski_normNLL_colnorm.lua)
    model = registry.build(
        "chorowski", input_frame_size=123, output_depth=v,
        feature_maps=0, filt_size=10, **dims,
    )
    tcfg = trainer_lib.TrainConfig(
        num_epochs=args.epochs, batch_size=args.batch_size,
        normalize_nll=True, beam_k=5, seed=args.seed,
    )
    # column-norm projection to maxval 1.0 — the reference's
    # columnNormConstraint default (TrainUtils.lua:52-53), the recipe's
    # only regularizer and what keeps the big model from memorizing
    ocfg = optim_lib.OptimConfig(
        rho=0.95, eps=1e-8, colnorm=True, colnorm_maxval=1.0, maxnorm=1e20
    )
    tr = trainer_lib.Trainer(model, ocfg, tcfg)
    tr.init(model.init(jax.random.PRNGKey(args.seed)))
    batcher = batching.BucketedBatcher.from_dataset(
        train, args.batch_size, n_buckets=4
    )

    backend = jax.default_backend()
    rows = []
    t0 = time.time()
    meta = {
        "backend": backend,
        "model": {"name": "chorowski", **dims, "output_depth": v},
        "corpus": {
            "train_utts": len(train), "valid_utts": len(valid),
            "n_phones": args.n_phones, "feat_dim": 123,
        },
        "recipe": "adadelta(0.95,1e-8) normalizeNLL beam_k=5 (canonical)",
    }
    print(f"backend={backend} model={meta['model']}", flush=True)
    for row in tr.fit(train, valid, batcher, decode_every=args.decode_every):
        row["wall_s"] = time.time() - t0
        rows.append({k: v for k, v in row.items()})
        msg = (
            f"ep {row['epoch']:3d} nll {row['train_nll']:.3f} "
            f"acc {row['train_accuracy']:.3f}"
        )
        if "valid_per" in row:
            msg += f" valid_per {row['valid_per']:.4f}"
        print(msg + f" ({row['wall_s']:.0f}s)", flush=True)
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            json.dump({"meta": meta, "trajectory": rows}, f, indent=1)
    pers = [r["valid_per"] for r in rows if "valid_per" in r]
    print(
        f"final valid PER {pers[-1]:.4f} (best {min(pers):.4f}) "
        f"over {len(rows)} epochs, {time.time()-t0:.0f}s",
        flush=True,
    )


if __name__ == "__main__":
    main()
