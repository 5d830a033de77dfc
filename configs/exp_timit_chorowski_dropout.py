#!/usr/bin/env python3
"""TIMIT Chorowski baseline with dropout 0.5 before the maxout readout.

Usage: python configs/exp_timit_chorowski_dropout.py --data <dir> [--save <dir>] [--epochs N] ...
Reference recipe: timit/model_chorowski_baseline_dropout.lua.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from seq2seq_attention_asr_tpu.train import experiment as exp_lib

if __name__ == "__main__":
    exp_lib.run_cli(exp_lib.timit_chorowski_dropout, dataset="timit", source_file=__file__)
