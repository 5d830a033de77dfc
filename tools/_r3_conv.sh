#!/bin/bash
# Round-3 flagship artifact: TIMIT-shaped convergence (full recipe,
# AWN + dropout, length curriculum) on one chip, then bench.
export PYTHONUNBUFFERED=1
cd /root/repo
echo "=== convergence start $(date +%s)"
python tools/convergence.py --timit-shape \
  --out runs/convergence_timit_shape.json \
  --save-dir runs/timit_shape_ckpt \
  --stage-epochs 300,120,200 --decode-every 3
echo "=== convergence rc=$? $(date +%s)"
echo "=== bench start $(date +%s)"
python bench.py
echo "=== bench rc=$? $(date +%s)"
