#!/usr/bin/env python3
"""TIMIT conv+BiLSTM model: 3x(conv+ReLU+maxpool) 8x time downsampling, BiLSTM encoder, LSTM decoder, location-aware attention.

Usage: python configs/exp_timit_conv_bilstm.py --data <dir> [--save <dir>] [--epochs N] ...
Reference recipe: timit/timit.lua:98-169 (inline model).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from seq2seq_attention_asr_tpu.train import experiment as exp_lib

if __name__ == "__main__":
    exp_lib.run_cli(exp_lib.timit_conv_bilstm, dataset="timit", source_file=__file__)
