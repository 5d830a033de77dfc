#!/usr/bin/env python3
"""Offline TIMIT preprocessing CLI — Python-3 replacement for the
reference's /root/reference/timit/preprocess_timit.py (Python 2).

Walks a TIMIT tree, extracts log-mel(+energy, deltas) features,
normalizes with train-set statistics, and writes train/valid/test HDF5
files with per-utterance groups {x, y, y39, start, finish} plus a
phonemes.txt vocab dump.

Usage:
  python tools/preprocess_timit.py --root /path/to/TIMIT --out ./data \
      [--variant logmel|logmel_stacked] [--max-utts N]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

from seq2seq_attention_asr_tpu.data import features, timit  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True, help="TIMIT corpus root")
    ap.add_argument("--out", required=True, help="output directory")
    ap.add_argument("--variant", default="logmel",
                    choices=["logmel", "logmel_stacked", "cqt",
                             "cqt_stacked", "cqt_exact",
                             "cqt_exact_stacked"])
    ap.add_argument("--pad", type=int, default=10)
    ap.add_argument("--max-utts", type=int, default=None,
                    help="truncate each split (smoke tests)")
    ap.add_argument("--pca", type=int, default=None,
                    help="project frames onto N train-set principal "
                         "components (preprocess_timit.py:316-333)")
    args = ap.parse_args()

    import functools

    fn = {
        "logmel": features.logmel_np,
        "logmel_stacked": features.logmel_stacked_np,
        "cqt": features.cqt_np,
        "cqt_stacked": features.cqt_stacked_np,
        # true constant-Q kernels (features.cqt_exact_np) instead of the
        # STFT-projected pseudo-CQT — see tests/test_data.py for the
        # measured difference
        "cqt_exact": functools.partial(features.cqt_np, method="exact"),
        "cqt_exact_stacked": functools.partial(
            features.cqt_stacked_np, method="exact"
        ),
    }[args.variant]

    train, valid, test, vocab, mean, std = timit.build_datasets(
        args.root, feature_fn=fn, pad=args.pad, max_utts=args.max_utts,
        pca_components=args.pca,
    )
    outdir = os.path.join(args.out, args.variant)
    os.makedirs(outdir, exist_ok=True)
    timit.save_hdf5(train, os.path.join(outdir, "train.h5"))
    timit.save_hdf5(valid, os.path.join(outdir, "valid.h5"))
    timit.save_hdf5(test, os.path.join(outdir, "test.h5"))
    np.savez(os.path.join(outdir, "mean_std.npz"), mean=mean, std=std)
    # phonemes.txt parity dump (preprocess_timit.py:176-180)
    with open(os.path.join(outdir, "phonemes.txt"), "w") as f:
        f.write("index60,phoneme60,index39,phoneme39\n")
        for i, p in enumerate(vocab.phones):
            f.write(
                f"{i},{p},{vocab.index39[vocab.fold39[p]]},{vocab.fold39[p]}\n"
            )
    print(
        f"wrote {len(train)} train / {len(valid)} valid / {len(test)} test "
        f"utterances to {outdir} "
        f"(inputFrameSize={train.x[0].shape[-1] if len(train) else '?'})"
    )


if __name__ == "__main__":
    main()
