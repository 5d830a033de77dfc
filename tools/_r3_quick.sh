#!/bin/bash
# Round-3 quick chip artifacts: step-time decomposition + bucket sweep.
export PYTHONUNBUFFERED=1
cd /root/repo
echo "=== perf_breakdown start $(date +%s)"
python tools/perf_breakdown.py --out runs/perf_breakdown.json
echo "=== perf_breakdown rc=$? $(date +%s)"
echo "=== bucket_sweep start $(date +%s)"
python tools/bucket_sweep.py --out runs/bucket_sweep.json
echo "=== bucket_sweep rc=$? $(date +%s)"
