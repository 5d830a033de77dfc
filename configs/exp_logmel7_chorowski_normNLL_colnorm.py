#!/usr/bin/env python3
"""Canonical TIMIT Chorowski recipe: normalized NLL, column-norm constraint, adadelta(0.95, 1e-8), orthogonal init, beam K=5.

Usage: python configs/exp_logmel7_chorowski_normNLL_colnorm.py --data <dir> [--save <dir>] [--epochs N] ...
Reference recipe: timit/exp_logmel7_chorowski_normNLL_colnorm.lua.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from seq2seq_attention_asr_tpu.train import experiment as exp_lib

if __name__ == "__main__":
    exp_lib.run_cli(exp_lib.timit_chorowski_normnll_colnorm, dataset="timit", source_file=__file__)
