#!/usr/bin/env python3
"""LibriSpeech Chorowski baseline on WORD targets (opt.labelset='words',
librispeech/train.lua:28 + utils_librispeech.lua:49-66): same
architecture, output layer sized to the word vocabulary, WER eval.

Preprocess with `tools/preprocess_librispeech.py --labelset words` so
the chunked targets are word ids, then:
  python configs/exp_librispeech_chorowski_words.py --data <dir> [...]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from seq2seq_attention_asr_tpu.train import experiment as exp_lib

if __name__ == "__main__":
    exp_lib.run_cli(
        exp_lib.librispeech_chorowski_words,
        dataset="librispeech",
        source_file=__file__,
    )
