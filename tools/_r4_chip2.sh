#!/bin/bash
export PYTHONUNBUFFERED=1
cd /root/repo
echo "=== block_tune start $(date +%s)"
timeout 3000 python tools/block_tune.py --out runs/block_tune.json
echo "=== block_tune rc=$? $(date +%s)"
echo "=== conv_bilstm long convergence start $(date +%s)"
timeout 4000 python tools/convergence.py --model conv_bilstm \
  --out runs/convergence_conv_bilstm.json \
  --train-utts 400 --valid-utts 64 --epochs 600 --batch-size 32 \
  --decode-every 20
echo "=== conv_bilstm rc=$? $(date +%s)"
echo "=== bench start $(date +%s)"
timeout 4000 python bench.py
echo "=== bench rc=$? $(date +%s)"
