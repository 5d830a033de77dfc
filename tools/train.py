#!/usr/bin/env python3
"""Training CLI — the `th exp_*.lua` equivalent.

Usage:
  python tools/train.py --exp timit_chorowski --data ./data/logmel \
      --save ./runs/exp1 [--resume] [--epochs N] [--batch-size N]

Experiments come from seq2seq_attention_asr_tpu.train.experiment (the
same recipes are also exposed as standalone scripts under configs/);
data is the HDF5 layout written by tools/preprocess_timit.py (or a
LibriSpeech chunk dir with train.db + meta.txt).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

EXPERIMENTS = {
    # name -> (builder attr, dataset kind)
    "timit_chorowski": ("timit_chorowski_normnll_colnorm", "timit"),
    "timit_chorowski_dropout": ("timit_chorowski_dropout", "timit"),
    "timit_conv_bilstm": ("timit_conv_bilstm", "timit"),
    "librispeech_chorowski": ("librispeech_chorowski", "librispeech"),
    "librispeech_chorowski_words": ("librispeech_chorowski_words", "librispeech"),
    "librispeech_vgg": ("librispeech_vgg", "librispeech"),
    "scriptchecker": ("scriptchecker", "scriptchecker"),
}


def main():
    import argparse

    ap = argparse.ArgumentParser(add_help=False)
    ap.add_argument("--exp", default="timit_chorowski", choices=sorted(EXPERIMENTS))
    args, rest = ap.parse_known_args()

    from seq2seq_attention_asr_tpu.train import experiment as exp_lib

    builder_name, dataset = EXPERIMENTS[args.exp]
    exp_lib.run_cli(
        getattr(exp_lib, builder_name), dataset=dataset, argv=rest,
        source_file=__file__,
    )


if __name__ == "__main__":
    main()
