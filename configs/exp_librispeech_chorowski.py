#!/usr/bin/env python3
"""LibriSpeech Chorowski baseline: character targets, CER eval with maxseqlen = 2L.

Usage: python configs/exp_librispeech_chorowski.py --data <dir> [--save <dir>] [--epochs N] ...
Reference recipe: librispeech/model_chorowski_baseline.lua.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from seq2seq_attention_asr_tpu.train import experiment as exp_lib

if __name__ == "__main__":
    exp_lib.run_cli(exp_lib.librispeech_chorowski, dataset="librispeech", source_file=__file__)
