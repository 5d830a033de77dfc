#!/bin/bash
# Round-4 serialized chip jobs (one lease at a time):
#   1. bf16 small-batch cliff + penalty-active fused-path timings
#   2. conv+BiLSTM convergence trajectory (short-recurrence recipe)
#   3. bench.py (BENCH_r04 preview incl. trained-decode + exact serving)
export PYTHONUNBUFFERED=1
cd /root/repo
echo "=== bf16_cliff start $(date +%s)"
timeout 4000 python tools/bf16_cliff.py --out runs/bf16_cliff.json
echo "=== bf16_cliff rc=$? $(date +%s)"
echo "=== conv_bilstm convergence start $(date +%s)"
timeout 4000 python tools/convergence.py --model conv_bilstm \
  --out runs/convergence_conv_bilstm.json \
  --train-utts 400 --valid-utts 64 --epochs 80 --batch-size 32 \
  --decode-every 5
echo "=== conv_bilstm rc=$? $(date +%s)"
echo "=== bench start $(date +%s)"
timeout 4000 python bench.py
echo "=== bench rc=$? $(date +%s)"
