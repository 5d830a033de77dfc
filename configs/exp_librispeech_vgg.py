#!/usr/bin/env python3
"""LibriSpeech VGG: conv-only encoder on 3-channel stacked logmel, two-layer maxout readout.

Usage: python configs/exp_librispeech_vgg.py --data <dir> [--save <dir>] [--epochs N] ...
Reference recipe: librispeech/model_vgg.lua.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from seq2seq_attention_asr_tpu.train import experiment as exp_lib

if __name__ == "__main__":
    exp_lib.run_cli(exp_lib.librispeech_vgg, dataset="librispeech", source_file=__file__)
