#!/bin/bash
# Sequential regeneration of reference baselines (N=10, published protocol).
# citeseer-avg already recovered from build/ref_runner.log (r2).
set -u
cd /root/repo
OUT=/root/repo/results/ref_baselines.jsonl
LOG=/root/repo/build/ref_queue.log
for spec in "citeseer single" "cora ppr" "cora avg" "cora single" "citeseer ppr"; do
  set -- $spec
  echo "=== $(date -u +%H:%M:%S) start $1 $2 ===" >> "$LOG"
  python tools/run_reference.py --dataset "$1" --prop_mode "$2" --runs 10 \
    --out "$OUT" >> "$LOG" 2>&1
  echo "=== $(date -u +%H:%M:%S) done $1 $2 rc=$? ===" >> "$LOG"
done
echo "=== QUEUE COMPLETE ===" >> "$LOG"
