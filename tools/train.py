#!/usr/bin/env python3
"""Training CLI — the `th exp_*.lua` equivalent.

Usage:
  python tools/train.py --exp timit_chorowski --data ./data/logmel \
      --save ./runs/exp1 [--resume] [--epochs N] [--batch-size N]

Experiments come from seq2seq_attention_asr_tpu.train.experiment; data
is the HDF5 layout written by tools/preprocess_timit.py (or a
LibriSpeech chunk dir with train.db + meta.txt).
"""

import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--exp", default="timit_chorowski",
                    choices=["timit_chorowski", "timit_chorowski_dropout",
                             "librispeech_chorowski", "scriptchecker"])
    ap.add_argument("--data", required=True)
    ap.add_argument("--save", default=None)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--batch-size", type=int, default=None)
    ap.add_argument("--max-samples", type=int, default=None)
    ap.add_argument("--decode-every", type=int, default=1)
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax

    from seq2seq_attention_asr_tpu.data import batching, librispeech as ls
    from seq2seq_attention_asr_tpu.data import timit as timit_data
    from seq2seq_attention_asr_tpu.train import experiment as exp_lib
    from seq2seq_attention_asr_tpu.train import trainer as trainer_lib

    vocab = None
    if args.exp.startswith("timit"):
        builder = (
            exp_lib.timit_chorowski_dropout
            if args.exp.endswith("dropout")
            else exp_lib.timit_chorowski_normnll_colnorm
        )
        exp = builder(data_path=args.data, save_dir=args.save)
        train_ds = timit_data.load_hdf5(os.path.join(args.data, "train.h5"))
        valid_ds = timit_data.load_hdf5(os.path.join(args.data, "valid.h5"))
        vocab = timit_data.Vocab.standard()
    elif args.exp == "librispeech_chorowski":
        meta = ls.load_meta(args.data)
        exp = exp_lib.librispeech_chorowski(
            num_chars=meta["numchars"], data_path=args.data, save_dir=args.save
        )
        # load all chunks in-memory (streaming epoch loop: see
        # Trainer docs; chunk-wise iteration available via ls.iter_chunks)
        chunks = list(ls.iter_chunks(args.data))
        train_ds = chunks[0]
        for c in chunks[1:]:
            train_ds.uids += c.uids
            train_ds.x += c.x
            train_ds.y += c.y
        valid_ds = timit_data.load_hdf5(os.path.join(args.data, "valid.h5"))
    else:  # scriptchecker
        exp = exp_lib.scriptchecker(save_dir=args.save)
        train_ds = timit_data.load_hdf5(os.path.join(args.data, "train.h5"))
        valid_ds = timit_data.load_hdf5(os.path.join(args.data, "valid.h5"))
        # size the output layer to the data's label space (out-of-range
        # ids would silently one-hot to zero rows)
        vmax = int(max(int(y.max()) for y in train_ds.y + valid_ds.y)) + 1
        exp.model_kwargs["output_depth"] = max(
            exp.model_kwargs.get("output_depth", 0), vmax
        )
        if train_ds.y39 is not None:
            vocab = timit_data.Vocab.standard()

    if args.epochs:
        exp.train = dataclasses.replace(exp.train, num_epochs=args.epochs)
    if args.batch_size:
        exp.train = dataclasses.replace(exp.train, batch_size=args.batch_size)
    if args.max_samples:
        exp.train = dataclasses.replace(exp.train, max_samples=args.max_samples)
    if exp.model_kwargs.get("input_frame_size") != train_ds.x[0].shape[-1]:
        exp.model_kwargs["input_frame_size"] = int(train_ds.x[0].shape[-1])
    exp.archive(__file__)

    model = exp.build_model()
    params = exp.init_params(jax.random.PRNGKey(exp.train.seed))
    tr = trainer_lib.Trainer(
        model, exp.optim, exp.train, vocab=vocab, save_dir=exp.save_dir,
        optim_resets=exp.optim_resets,
    )
    tr.init(params)
    batcher = batching.BucketedBatcher.from_dataset(
        train_ds, batch_size=exp.train.batch_size
    )
    for row in tr.fit(
        train_ds, valid_ds, batcher, resume=args.resume,
        decode_every=args.decode_every,
    ):
        keys = ("epoch", "train_nll", "train_accuracy", "valid_nll",
                "valid_accuracy", "valid_per", "train_seconds",
                "train_samples_per_s")
        print(
            "  ".join(
                f"{k}={row[k]:.4f}" if isinstance(row.get(k), float)
                else f"{k}={row.get(k)}"
                for k in keys if k in row
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
