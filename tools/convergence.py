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
                 (8-50 phones x 2-5 frames), and the FULL flagship
                 recipe — AdaptiveWeightNoise (lambda = 1/N_train,
                 AdaptiveWeightNoise.lua:18) + dropout 0.5
                 (model_chorowski_baseline_dropout.lua:56) + colnorm —
                 the long-run AWN-stability evidence VERDICT r2 asked
                 for. Defaults sized to ~TIMIT: 4000 train utterances.

                 Runs as a 3-stage length curriculum (measured: the
                 attention alignment cannot bootstrap from scratch on
                 long utterances — an all-(25-50)-phone corpus leaves
                 NLL at the unigram plateau for 20k+ steps):
                   1 bootstrap: the <=17-token subset, dropout only
                   2 full:      whole corpus, dropout only
                   3 awn:       whole corpus, AWN + dropout — the
                                hundreds-of-epochs stability evidence
                                with the colnorm-on-mu interaction

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

import numpy as np

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
        "--model", default="chorowski",
        choices=("chorowski", "conv_bilstm", "vgg"),
        help="conv_bilstm = the 8x time-downsampling short-recurrence "
             "recipe (timit/timit.lua:98-169) — the PERF.md MFU-ceiling "
             "experiment; vgg = the LibriSpeech VGG recipe "
             "(model_vgg.lua) on char-shaped synthetic targets with "
             "3-channel stacked features (default-mode corpus only)",
    )
    ap.add_argument("--feature-maps", type=int, default=16,
                    help="location-attention feature maps for --model "
                         "vgg (opt.hybridAttendFeatureMaps, "
                         "model_vgg.lua:61; reference default 0 = "
                         "content-only — see the vgg branch note)")
    ap.add_argument("--unique-phones", action="store_true",
                    help="sample each utterance's phones without "
                         "replacement — required for content-only "
                         "attention over local-receptive-field encoders "
                         "(VGG): repeated phones give identical "
                         "annotations the free-running decode cannot "
                         "disambiguate (see data/synthetic.py)")
    ap.add_argument("--chunks", type=int, default=1,
                    help=">1: split the synthetic train set into N chunks "
                         "and drive the out-of-core chunked epoch loop "
                         "(librispeech/train.lua:82-103) — the exact path "
                         "real LibriSpeech training uses")
    ap.add_argument(
        "--timit-shape", action="store_true",
        help="61-phone TIMIT-shaped corpus + full recipe (AWN + dropout)",
    )
    ap.add_argument("--stage-epochs", default=None,
                    help="timit-shape stage lengths 'boot,full,awn'")
    ap.add_argument("--awn-only", action="store_true",
                    help="run ONLY the AWN stage, initialized from "
                         "--from-ckpt (a boot/full-stage Trainer ckpt)")
    ap.add_argument("--from-ckpt", default=None,
                    help="Trainer checkpoint to initialize --awn-only from")
    ap.add_argument("--awn-lambda", type=float, default=None,
                    help="AWN KL weight (default 1/N_train, the Graves/"
                         "reference scaling — AdaptiveWeightNoise.lua:18). "
                         "Under adadelta the KL pull gets scale-invariant "
                         "full-size steps, so on BATCHED steps (batch-mean "
                         "NLL grads ~sqrt(b) smaller than the reference's "
                         "per-sample steps) 1/N drains mu toward the prior "
                         "mean within an epoch (measured: |mu| 83->0.8 in "
                         "200 steps); docs/AWN_NOTES.md derives the stable "
                         "operating range.")
    ap.add_argument("--awn-sigma-init", type=float, default=0.01,
                    help="AWN posterior init sigma. The reference default "
                         "0.075 (timit.lua:36) targets FROM-SCRATCH "
                         "training (init weight scale ~0.06); on a TRAINED "
                         "colnorm-1.0 model it is ~1.3x the param rms and "
                         "collapses the model unrecoverably (measured: "
                         "sampled NLL 5.4-5.9 vs 1.26 at mu; the r3 awn "
                         "stage sat at the unigram plateau for 200 "
                         "epochs). 0.01 leaves sampled NLL at 1.30.")
    ap.add_argument("--save-dir", default=None,
                    help="Trainer checkpoint dir (+ best-PER eval export)")
    ap.add_argument("--compute-dtype", default=None,
                    help="override model compute dtype (e.g. bfloat16)")
    ap.add_argument("--host-features", action="store_true",
                    help="stage host-generated features instead of "
                         "on-device synthesis (timit-shape mode)")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    if args.timit_shape:
        run_timit_shape(args)
        return

    import jax

    from seq2seq_attention_asr_tpu.data import batching, synthetic
    from seq2seq_attention_asr_tpu.models import registry
    from seq2seq_attention_asr_tpu.train import optim as optim_lib
    from seq2seq_attention_asr_tpu.train import trainer as trainer_lib

    n_train = args.train_utts or 200
    n_valid = args.valid_utts or 40
    epochs = args.epochs or 40
    batch = args.batch_size or 16

    feat_dim = 40 if args.model == "vgg" else 123
    train, valid, v = synthetic.train_valid(
        n_train, n_valid, n_phones=args.n_phones,
        feat_dim=feat_dim, min_len=6, max_len=16, frames_per_phone=(4, 9),
        noise=args.noise, seed=args.seed,
        unique_phones=args.unique_phones,
    )
    if args.model == "vgg":
        # the VGG recipe consumes 3-channel (L, freq, 3) stacked
        # features (model_vgg.lua NHWC input; logmel/delta/delta-delta
        # in the real pipeline) — derive the delta channels exactly as
        # data/features.logmel_stacked_np does. The prototypes are
        # additionally smoothed along the FREQ axis: real log-mel bins
        # are locally correlated, which is precisely the structure the
        # VGG's 3x3 convs + freq-maxpools assume — white-noise
        # prototypes alias under freq pooling and the encoder cannot
        # generalize the phone->feature mapping (measured: train acc
        # 0.93 with valid teacher-forced accuracy near chance).
        from seq2seq_attention_asr_tpu.data import features as F

        k = np.array([0.25, 0.5, 0.25])

        def smooth_freq(x):
            pad = np.pad(x, ((0, 0), (2, 2)), mode="edge")
            for _ in range(2):
                pad = (k[0] * np.roll(pad, 1, 1) + k[1] * pad
                       + k[2] * np.roll(pad, -1, 1))
            return pad[:, 2:-2]

        def stack3(x):
            x = smooth_freq(x)
            d1 = F.delta_np(x.T, order=1).T
            d2 = F.delta_np(x.T, order=2).T
            return np.ascontiguousarray(
                np.stack([x, d1, d2], axis=-1), np.float32
            )

        for ds_ in (train, valid):
            ds_.x[:] = [stack3(x) for x in ds_.x]
    corpus_desc = {
        "kind": "synthetic", "train_utts": n_train,
        "valid_utts": n_valid, "n_phones": args.n_phones,
        "feat_dim": feat_dim, "noise": args.noise,
        "unique_phones": bool(args.unique_phones),
        "stacked_channels": 3 if args.model == "vgg" else 0,
    }

    if args.model == "conv_bilstm":
        # the short-recurrence recipe (8x conv+pool downsampling, LSTM
        # decoder, location-aware featMaps 16 — timit/timit.lua:98-169)
        dims = (
            dict(hidden_frame_size=64, output_frame_size=32,
                 score_depth=64, state_depth=100)
            if args.small
            else dict(hidden_frame_size=256, output_frame_size=128,
                      score_depth=150, state_depth=400)
        )
        model = registry.build(
            "conv_bilstm", input_frame_size=123, output_depth=v,
            feature_maps=16, filt_size=5, **dims,
        )
    elif args.model == "vgg":
        # the LibriSpeech VGG recipe (librispeech/model_vgg.lua): conv
        # encoder on 3-channel stacked features, annotationDepth =
        # outputFrameSize, two-layer maxout readout. The reference
        # exposes hybridAttendFeatureMaps (model_vgg.lua:61); on the
        # synthetic prototype corpus location-aware attention (fm>0)
        # is REQUIRED for free-running decode: the conv encoder's
        # 8-frame receptive field carries no positional signal, so
        # content-only attention cannot track the read position
        # (teacher-forced accuracy memorizes while beam CER stalls —
        # two committed chip runs at fm=0).
        dims = (
            dict(output_frame_size=64, score_depth=64, state_depth=64,
                 mlp_depth=32)
            if args.small
            else dict(output_frame_size=512, score_depth=512,
                      state_depth=256, mlp_depth=64)
        )
        model = registry.build(
            "vgg", input_frame_size=40, output_depth=v,
            feature_maps=args.feature_maps, filt_size=10, **dims,
        )
        dims["feature_maps"] = args.feature_maps
    else:
        dims = _dims(args.small)
        # canonical recipe: content+state attention (featureMaps 0), GRU
        # decoder, maxout readout, adadelta(0.95, 1e-8), normalized NLL,
        # column-norm constraint (exp_logmel7_chorowski_normNLL_colnorm.lua)
        model = registry.build(
            "chorowski", input_frame_size=123, output_depth=v,
            feature_maps=0, filt_size=10, **dims,
        )
    tcfg = trainer_lib.TrainConfig(
        num_epochs=epochs, batch_size=batch,
        normalize_nll=True, beam_k=5, seed=args.seed,
        # LibriSpeech eval gives the beam a 2L step budget
        # (librispeech/train.lua:251-252)
        eval_len_factor=2.0 if args.model == "vgg" else 1.0,
    )
    tr = trainer_lib.Trainer(
        model, _ocfg(), tcfg, save_dir=args.save_dir
    )
    import jax as _jax

    tr.init(model.init(_jax.random.PRNGKey(args.seed)))
    batcher = batching.BucketedBatcher.from_dataset(train, batch, n_buckets=4)
    if jax.default_backend() not in ("cpu",):
        # tunneled chip: stage batches on device ONCE (CLAUDE.md — a
        # per-step host batch transfer costs ~40x the step itself)
        batcher = batching.CachedDeviceBatcher(batcher, seed=args.seed)

    chunked = None
    if args.chunks > 1:
        # out-of-core chunk loop (librispeech/train.lua:82-103): the
        # exact code path real LibriSpeech training runs — one chunk
        # resident at a time, shuffled chunk order per epoch
        import dataclasses as _dc

        n = len(train)
        per = -(-n // args.chunks)
        subs = [
            _dc.replace(
                train, uids=train.uids[lo:lo + per], x=train.x[lo:lo + per],
                y=train.y[lo:lo + per], start=train.start[lo:lo + per],
                finish=train.finish[lo:lo + per],
            )
            for lo in range(0, n, per)
        ]
        _bt_cache = {}

        def _chunk_batcher(ds):
            # memoize per chunk: Trainer.fit asks for a batcher on each
            # chunk visit, and a fresh CachedDeviceBatcher would
            # re-stage the chunk over the tunnel every epoch
            if id(ds) not in _bt_cache:
                bt = batching.BucketedBatcher.from_dataset(
                    ds, batch, n_buckets=2
                )
                if jax.default_backend() not in ("cpu",):
                    bt = batching.CachedDeviceBatcher(bt, seed=args.seed)
                _bt_cache[id(ds)] = bt
            return _bt_cache[id(ds)]

        chunked = (lambda i: subs[i], len(subs), _chunk_batcher)

    meta = {
        "backend": jax.default_backend(),
        "model": {"name": args.model, **dims, "output_depth": v},
        "corpus": corpus_desc,
        "chunks": args.chunks,
        "recipe": "adadelta(0.95,1e-8) normalizeNLL beam_k=5 (canonical)",
    }
    print(f"backend={meta['backend']} model={meta['model']}", flush=True)
    rows = []
    t0 = time.time()
    _fit_logged(tr, train, valid, batcher, args.decode_every, rows, t0,
                meta, args.out, chunked=chunked)
    _summary(rows, t0)
    _export_best(args.save_dir, tr, tcfg)


def _dims(small: bool):
    return (
        dict(hidden_frame_size=64, output_frame_size=64, score_depth=128,
             state_depth=64, mlp_depth=32)
        if small
        else dict(hidden_frame_size=256, output_frame_size=256,
                  score_depth=512, state_depth=256, mlp_depth=64)
    )


def _ocfg():
    """Column-norm projection to maxval 1.0 — the reference's
    columnNormConstraint default (TrainUtils.lua:52-53)."""
    from seq2seq_attention_asr_tpu.train import optim as optim_lib

    return optim_lib.OptimConfig(
        rho=0.95, eps=1e-8, colnorm=True, colnorm_maxval=1.0, maxnorm=1e20
    )


def _fit_logged(tr, train, valid, batcher, decode_every, rows, t0, meta,
                out, stage=None, chunked=None):
    import json as _json

    for row in tr.fit(train, valid, batcher, decode_every=decode_every,
                      ckpt_every=25, chunked=chunked):
        row["wall_s"] = time.time() - t0
        if stage:
            row["stage"] = stage
        rows.append(dict(row))
        msg = (
            f"{stage or 'ep'} ep {row['epoch']:3d} nll {row['train_nll']:.3f} "
            f"acc {row['train_accuracy']:.3f}"
        )
        if "valid_per" in row:
            msg += f" valid_per {row['valid_per']:.4f}"
        print(msg + f" ({row['wall_s']:.0f}s)", flush=True)
        os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
        with open(out, "w") as f:
            _json.dump({"meta": meta, "trajectory": rows}, f, indent=1)


def _summary(rows, t0):
    pers = [r["valid_per"] for r in rows if "valid_per" in r]
    if pers:
        print(
            f"final valid PER {pers[-1]:.4f} (best {min(pers):.4f}) "
            f"over {len(rows)} epochs, {time.time()-t0:.0f}s",
            flush=True,
        )


def _export_best(save_dir, tr, tcfg):
    """Export the best-PER EVAL params (AWN mode() = mu) as a plain
    model-params pytree for bench.py's trained-decode section."""
    if not save_dir:
        return
    from seq2seq_attention_asr_tpu.train import checkpoint
    from seq2seq_attention_asr_tpu.train import trainer as trainer_lib

    like = {"state": tr.state, "epoch": 0, "best": dict(tr.best)}
    path = tr._ckpt_path("best_valid_PER")
    src = path if checkpoint.exists(path) else tr._ckpt_path("latest")
    blob = checkpoint.load(src, like=like)
    eval_params = trainer_lib.eval_params(tcfg, blob["state"][0])
    checkpoint.save(os.path.join(save_dir, "ckpt_best_eval"), eval_params)
    print(f"exported best eval params from {src}", flush=True)


def run_timit_shape(args):
    """3-stage length-curriculum run of the full flagship recipe (see
    module docstring)."""
    import dataclasses

    import jax

    from seq2seq_attention_asr_tpu.data import batching, synthetic
    from seq2seq_attention_asr_tpu.models import registry
    from seq2seq_attention_asr_tpu.train import trainer as trainer_lib

    n_train = args.train_utts or 4000
    n_valid = args.valid_utts or 192
    batch = args.batch_size or 32
    stages = [int(s) for s in (args.stage_epochs or "400,200,300").split(",")]

    train, valid, vocab = synthetic.timit_shaped(
        n_train, n_valid, noise=args.noise, seed=args.seed
    )
    v = vocab.size
    short_idx = [i for i in range(len(train)) if len(train.y[i]) <= 17]
    boot = dataclasses.replace(
        train,
        uids=[train.uids[i] for i in short_idx],
        x=[train.x[i] for i in short_idx],
        y=[train.y[i] for i in short_idx],
        y39=[train.y39[i] for i in short_idx],
        start=[train.start[i] for i in short_idx],
        finish=[train.finish[i] for i in short_idx],
    )

    dims = _dims(args.small)
    mk = dict(input_frame_size=123, output_depth=v, feature_maps=0,
              filt_size=10, dropout=0.5, **dims)
    if args.compute_dtype:
        mk["compute_dtype"] = args.compute_dtype
    model = registry.build("chorowski_dropout", **mk)

    meta = {
        "backend": jax.default_backend(),
        "model": {"name": "chorowski_dropout", **dims, "output_depth": v},
        "corpus": {
            "kind": "timit_shaped", "train_utts": n_train,
            "valid_utts": n_valid, "n_phones": 61, "feat_dim": 123,
            "bootstrap_utts": len(boot),
            "scoring": "61->39 Kaldi fold, beam K=5 (timit.lua:397-415)",
        },
        "recipe": (
            "adadelta(0.95,1e-8) normalizeNLL colnorm1.0 dropout0.5 "
            f"beam_k=5; stage3 AWN(lambda=1/{n_train},"
            f"sigma0={args.awn_sigma_init}); length curriculum {stages}"
        ),
    }
    print(f"backend={meta['backend']} model={meta['model']} "
          f"boot={len(boot)} utts", flush=True)
    rows = []
    t0 = time.time()
    sd = lambda tag: (os.path.join(args.save_dir, tag)
                      if args.save_dir else None)

    tcfg = trainer_lib.TrainConfig(
        num_epochs=stages[0], batch_size=batch, normalize_nll=True,
        beam_k=5, seed=args.seed,
    )
    tr = trainer_lib.Trainer(model, _ocfg(), tcfg, vocab=vocab,
                             save_dir=sd("boot"))
    tr.init(model.init(jax.random.PRNGKey(args.seed)))
    # device-resident batches: over the tunneled chip a per-step batch
    # transfer costs ~40x the step itself, so batches are staged on
    # device once and only their ORDER reshuffles per epoch
    # ... and the corpus FEATURES are synthesized on device from the
    # prototype table (uint8 index maps are all that crosses the link:
    # ~2 MB instead of ~200 MB for the 4000-utt corpus)
    synth = None
    if not args.host_features:
        synth = batching.DeviceSynth(
            synthetic.prototype_table(61, 123, args.seed),
            noise=args.noise, seed=args.seed,
        )
    full_batcher = batching.CachedDeviceBatcher(
        batching.BucketedBatcher.from_dataset(train, batch, n_buckets=3),
        seed=args.seed, synth=synth,
    )
    if args.awn_only:
        # stage-3-only rerun: initialize from a saved boot/full-stage
        # Trainer checkpoint instead of repeating the curriculum
        assert args.from_ckpt, "--awn-only needs --from-ckpt"
        from seq2seq_attention_asr_tpu.train import checkpoint

        tcfg0 = trainer_lib.TrainConfig(
            num_epochs=1, batch_size=batch, normalize_nll=True,
            beam_k=5, seed=args.seed,
        )
        tr = trainer_lib.Trainer(model, _ocfg(), tcfg0, vocab=vocab)
        tr.init(model.init(jax.random.PRNGKey(args.seed)))
        like = {"state": tr.state, "epoch": 0, "best": dict(tr.best)}
        blob = checkpoint.load(args.from_ckpt, like=like)
        tr.state = blob["state"]
        meta["recipe"] += f"; awn-only from {args.from_ckpt} (ep {blob['epoch']})"
        print(f"awn-only: loaded {args.from_ckpt} at epoch {blob['epoch']} "
              f"best={blob['best']}", flush=True)
    else:
        boot_batcher = batching.CachedDeviceBatcher(
            batching.BucketedBatcher.from_dataset(boot, batch, n_buckets=2),
            seed=args.seed, synth=synth,
        )
        _fit_logged(tr, boot, valid, boot_batcher,
                    max(args.decode_every * 5, 20), rows, t0, meta,
                    args.out, stage="boot")

        # stage 2: same trainer/params, whole corpus
        tr.save_dir = sd("full") or tr.save_dir
        tr.tcfg = dataclasses.replace(tr.tcfg, num_epochs=stages[0] + stages[1])
        _fit_logged(tr, train, valid, full_batcher, args.decode_every,
                    rows, t0, meta, args.out, stage="full")

    # stage 3: AdaptiveWeightNoise on (lambda ~= 1/N_train, Graves 2011;
    # AdaptiveWeightNoise.lua:18 "equals 1/B"), dropout still active —
    # the hundreds-of-epochs stability evidence with colnorm-on-mu.
    # sigma0 comes from --awn-sigma-init: the reference default 0.075 is
    # a FROM-SCRATCH scale and destroys a trained model (see the flag's
    # help text and runs/convergence_timit_shape.json notes).
    lam = args.awn_lambda if args.awn_lambda is not None else 1.0 / n_train
    meta["recipe"] += f"; awn lambda={lam:g} sigma0={args.awn_sigma_init}"
    tcfg3 = trainer_lib.TrainConfig(
        num_epochs=stages[2], batch_size=batch, normalize_nll=True,
        beam_k=5, seed=args.seed + 1, noise="awn",
        awn_lambda=lam, awn_sigma_init=args.awn_sigma_init,
    )
    tr3 = trainer_lib.Trainer(model, _ocfg(), tcfg3, vocab=vocab,
                              save_dir=sd("awn"))
    tr3.init(trainer_lib.eval_params(tr.tcfg, tr.state[0]))
    _fit_logged(tr3, train, valid, full_batcher, args.decode_every,
                rows, t0, meta, args.out, stage="awn")
    _summary(rows, t0)
    _export_best(args.save_dir and sd("awn"), tr3, tcfg3)


if __name__ == "__main__":
    # one chip client at a time (CLAUDE.md; utils/lease.py)
    from seq2seq_attention_asr_tpu.utils.lease import chip_lease

    with chip_lease("convergence.py"):
        main()
