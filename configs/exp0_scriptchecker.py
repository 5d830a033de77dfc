#!/usr/bin/env python3
"""End-to-end smoke test on a tiny preprocessed dataset (3 samples, small model).

Usage: python configs/exp0_scriptchecker.py --data <dir> [--save <dir>] [--epochs N] ...
Reference recipe: librispeech/exp0_scriptchecker.lua.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from seq2seq_attention_asr_tpu.train import experiment as exp_lib

if __name__ == "__main__":
    exp_lib.run_cli(exp_lib.scriptchecker, dataset="scriptchecker", source_file=__file__)
