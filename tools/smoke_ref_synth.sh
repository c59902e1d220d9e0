#!/bin/bash
# 1-run reference smokes on the synthetic dumps (pre-N=10 sanity).
set -u
cd /root/repo
LOG=/root/repo/build/ref_synth_smoke.log
: > "$LOG"
for ds in pubmed mag_scholar_c reddit Amazon2M; do
  echo "=== $(date -u +%H:%M:%S) start $ds ===" >> "$LOG"
  timeout 3000 python tools/run_reference.py --dataset "$ds" --prop_mode ppr \
    --runs 1 --data_dir build/refdata_synth >> "$LOG" 2>&1
  echo "=== $(date -u +%H:%M:%S) done $ds rc=$? ===" >> "$LOG"
done
echo "=== SMOKE COMPLETE ===" >> "$LOG"
