#!/usr/bin/env python3
"""Convergence trajectory harness — records a beam-search PER curve for
the canonical Chorowski recipe (the north-star quality metric,
/root/reference/timit/timit.lua:397-415 + BASELINE.json).

Real TIMIT/LibriSpeech audio is not redistributable, so the harness
trains on the synthetic phone-emission task (data/synthetic.py) at
TIMIT-like dimensions: 123-dim frames, variable phone durations — the
same structure (monotonic alignment, per-phone identity, EOS
termination) the attention recipe must learn on real speech. The PER
here is a held-out-set beam-search PER, i.e. generalization, not
memorization.

Two corpus modes:
  default:       40 phones, short utterances (fast CI-scale runs)
  --timit-shape: the standard 61-phone(+<EOS>) TIMIT vocabulary with
                 61->39-fold scoring, TIMIT-like utterance shapes
                 (~25-50 phones x 2-5 frames), and the FULL flagship
                 recipe — AdaptiveWeightNoise (lambda = 1/N_train,
                 AdaptiveWeightNoise.lua:18) + dropout 0.5
                 (model_chorowski_baseline_dropout.lua:56) + colnorm —
                 the long-run AWN-stability evidence VERDICT r2 asked
                 for. Defaults sized to ~TIMIT: 4000 train utterances.

Writes one JSON with the full per-epoch trajectory; committed runs live
in runs/ (e.g. runs/convergence_tpu.json). With --save-dir the Trainer
checkpoints there and the best-PER EVAL params (AWN mode = mu) are
exported to <save-dir>/ckpt_best_eval for bench.py's trained-decode
section.

Usage:
  python tools/convergence.py --out runs/convergence.json \
      [--epochs 40] [--train-utts 200] [--valid-utts 40] [--cpu] [--small]
  python tools/convergence.py --timit-shape --out runs/convergence_timit_shape.json \
      --save-dir runs/timit_shape_ckpt [--epochs 150] [--decode-every 5]
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
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--train-utts", type=int, default=None)
    ap.add_argument("--valid-utts", type=int, default=None)
    ap.add_argument("--n-phones", type=int, default=40)
    ap.add_argument("--noise", type=float, default=0.35)
    ap.add_argument("--batch-size", type=int, default=None)
    ap.add_argument("--decode-every", type=int, default=2)
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument(
        "--small", action="store_true",
        help="quarter-size model for quick smoke runs",
    )
    ap.add_argument(
        "--timit-shape", action="store_true",
        help="61-phone TIMIT-shaped corpus + full recipe (AWN + dropout)",
    )
    ap.add_argument("--save-dir", default=None,
                    help="Trainer checkpoint dir (+ best-PER eval export)")
    ap.add_argument("--compute-dtype", default=None,
                    help="override model compute dtype (e.g. bfloat16)")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax

    from seq2seq_attention_asr_tpu.data import batching, synthetic
    from seq2seq_attention_asr_tpu.models import registry
    from seq2seq_attention_asr_tpu.train import optim as optim_lib
    from seq2seq_attention_asr_tpu.train import trainer as trainer_lib

    n_train = args.train_utts or (4000 if args.timit_shape else 200)
    n_valid = args.valid_utts or (192 if args.timit_shape else 40)
    epochs = args.epochs or (150 if args.timit_shape else 40)
    batch = args.batch_size or (32 if args.timit_shape else 16)

    vocab = None
    if args.timit_shape:
        train, valid, vocab = synthetic.timit_shaped(
            n_train, n_valid, noise=args.noise, seed=args.seed
        )
        v = vocab.size
        corpus_desc = {
            "kind": "timit_shaped", "train_utts": n_train,
            "valid_utts": n_valid, "n_phones": 61, "feat_dim": 123,
            "scoring": "61->39 Kaldi fold, beam K=5 (timit.lua:397-415)",
        }
    else:
        train, valid, v = synthetic.train_valid(
            n_train, n_valid, n_phones=args.n_phones,
            feat_dim=123, min_len=6, max_len=16, frames_per_phone=(4, 9),
            noise=args.noise, seed=args.seed,
        )
        corpus_desc = {
            "kind": "synthetic", "train_utts": n_train,
            "valid_utts": n_valid, "n_phones": args.n_phones,
            "feat_dim": 123,
        }

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
    model_name = "chorowski_dropout" if args.timit_shape else "chorowski"
    mk = dict(input_frame_size=123, output_depth=v, feature_maps=0,
              filt_size=10, **dims)
    if args.compute_dtype:
        mk["compute_dtype"] = args.compute_dtype
    model = registry.build(model_name, **mk)
    tk = dict(
        num_epochs=epochs, batch_size=batch,
        normalize_nll=True, beam_k=5, seed=args.seed,
    )
    if args.timit_shape:
        # AdaptiveWeightNoise over the whole run: lambda ~= 1/N_train
        # (Graves 2011; AdaptiveWeightNoise.lua:18 "equals 1/B"),
        # sigma_init 0.075 (timit.lua:196-205 wiring)
        tk.update(noise="awn", awn_lambda=1.0 / n_train,
                  awn_sigma_init=0.075)
    tcfg = trainer_lib.TrainConfig(**tk)
    # column-norm projection to maxval 1.0 — the reference's
    # columnNormConstraint default (TrainUtils.lua:52-53)
    ocfg = optim_lib.OptimConfig(
        rho=0.95, eps=1e-8, colnorm=True, colnorm_maxval=1.0, maxnorm=1e20
    )
    tr = trainer_lib.Trainer(
        model, ocfg, tcfg, vocab=vocab, save_dir=args.save_dir
    )
    tr.init(model.init(jax.random.PRNGKey(args.seed)))
    batcher = batching.BucketedBatcher.from_dataset(
        train, batch, n_buckets=4
    )

    backend = jax.default_backend()
    rows = []
    t0 = time.time()
    meta = {
        "backend": backend,
        "model": {"name": model_name, **dims, "output_depth": v,
                  **({"compute_dtype": args.compute_dtype}
                     if args.compute_dtype else {})},
        "corpus": corpus_desc,
        "recipe": (
            "adadelta(0.95,1e-8) normalizeNLL colnorm1.0 beam_k=5"
            + (" AWN(lambda=1/N,sigma0=0.075) dropout0.5"
               if args.timit_shape else " (canonical)")
        ),
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
    if args.save_dir:
        # export the best-PER EVAL params (AWN mode() = mu) as a plain
        # model-params pytree for bench.py's trained-decode section
        from seq2seq_attention_asr_tpu.train import checkpoint

        like = {"state": tr.state, "epoch": 0, "best": dict(tr.best)}
        path = tr._ckpt_path("best_valid_PER")
        src = path if checkpoint.exists(path) else tr._ckpt_path("latest")
        blob = checkpoint.load(src, like=like)
        eval_params = trainer_lib.eval_params(tcfg, blob["state"][0])
        checkpoint.save(
            os.path.join(args.save_dir, "ckpt_best_eval"), eval_params
        )
        print(f"exported best eval params from {src}", flush=True)


if __name__ == "__main__":
    main()
