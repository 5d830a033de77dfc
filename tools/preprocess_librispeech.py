#!/usr/bin/env python3
"""Offline LibriSpeech preprocessing CLI — replacement for
/root/reference/librispeech/preprocess.py.

Builds char/word vocabularies, extracts features, and writes a chunked
train set (trainN.h5 + train.db manifest) plus valid/test HDF5 and
meta.txt. FLAC decodes natively (native/flacdec.cpp, pure-Python
fallback in data/flac.py). --labelset picks character or word targets
(opt.labelset, librispeech/train.lua:28); --script-test truncates to a
tiny smoke dataset like the reference's --script_test
(preprocess.py:35-39).

Usage:
  python tools/preprocess_librispeech.py --train DIR --valid DIR \
      --test DIR --out ./data [--chunks 8] [--labelset chars|words] \
      [--script-test]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

from seq2seq_attention_asr_tpu.data import features, librispeech as ls  # noqa: E402
from seq2seq_attention_asr_tpu.data import timit as timit_data  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--train", required=True)
    ap.add_argument("--valid", required=True)
    ap.add_argument("--test", default=None)
    ap.add_argument("--out", required=True)
    ap.add_argument("--chunks", type=int, default=8)
    ap.add_argument("--labelset", choices=("chars", "words"), default="chars")
    ap.add_argument("--variant", choices=("logmel", "logmel_stacked"),
                    default="logmel",
                    help="logmel: flat 123-dim frames (chorowski recipes); "
                         "logmel_stacked: 3-channel (L, freq, 3) "
                         "logmel/delta/delta-delta for the VGG recipe "
                         "(model_vgg.lua NHWC input)")
    ap.add_argument("--script-test", action="store_true")
    args = ap.parse_args()

    roots = {"train": args.train, "valid": args.valid}
    if args.test:
        roots["test"] = args.test
    max_utts = 20 if args.script_test else None
    feature_fn = (
        features.logmel_stacked_np
        if args.variant == "logmel_stacked"
        else features.logmel_np
    )
    datasets, vocab, mean, std = ls.build_datasets(
        roots, feature_fn=feature_fn, pad=1, max_utts=max_utts,
        labelset=args.labelset,
    )
    if args.variant == "logmel_stacked":
        # normalize_corpus works channel-first (3, L, F); store
        # TIME-major (L, F, 3) so bucketing/padding key on axis 0 and
        # the batch arrives NHWC exactly as vgg.encode expects.
        for ds_ in datasets.values():
            ds_.x[:] = [
                np.ascontiguousarray(np.transpose(f, (1, 2, 0)), np.float32)
                for f in ds_.x
            ]
    os.makedirs(args.out, exist_ok=True)
    n_chunks = 5 if args.script_test else args.chunks
    ls.save_chunked(datasets["train"], args.out, n_chunks=n_chunks)
    for split in ("valid", "test"):
        if split in datasets:
            timit_data.save_hdf5(
                datasets[split], os.path.join(args.out, f"{split}.h5")
            )
    np.savez(os.path.join(args.out, "mean_std.npz"), mean=mean, std=std)
    d = datasets["train"]
    ls.save_meta(
        args.out,
        {
            "inputFrameSize": (
                int(d.x[0].shape[-2] if d.x[0].ndim == 3 else d.x[0].shape[-1])
                if len(d) else 0
            ),
            "trainsamples": len(d),
            "validsamples": len(datasets.get("valid", [])),
            "testsamples": len(datasets.get("test", [])),
            "numchars": vocab.num_chars,
            "numwords": vocab.num_words,
            "labelset_words": 1 if args.labelset == "words" else 0,
        },
    )
    with open(os.path.join(args.out, "chars.txt"), "w") as f:
        for c, i in sorted(vocab.charmap.items(), key=lambda kv: kv[1]):
            f.write(f"{c!r} {i}\n")
    print(f"wrote {len(d)} train utterances in {n_chunks} chunks to {args.out}")


if __name__ == "__main__":
    main()
