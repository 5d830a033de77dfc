#!/bin/bash
# Round-3 post-bench chip jobs: re-run the (DCE-fixed) step breakdown,
# then the v2 bucket sweep (16-aligned, filled buckets).
export PYTHONUNBUFFERED=1
cd /root/repo
echo "=== perf_breakdown v2 start $(date +%s)"
python tools/perf_breakdown.py --out runs/perf_breakdown.json
echo "=== perf_breakdown rc=$? $(date +%s)"
echo "=== bucket_sweep v2 start $(date +%s)"
python tools/bucket_sweep.py --out runs/bucket_sweep.json
echo "=== bucket_sweep rc=$? $(date +%s)"
