#!/bin/bash
# Round-4 follow-up: extend the cross-engine synthetic parity to the
# avg/single prop modes on a large-graph preset (aminer — the cheapest
# reference runs). Same protocol as tools/synth_parity_queue.sh: N=10 both
# engines on the identical dumps in build/refdata_synth.
# Usage: tools/mode_parity_queue.sh
set -u
cd /root/repo
LOG=/root/repo/build/mode_parity.log
: > "$LOG"
for mode in avg single; do
  echo "=== $(date -u +%H:%M:%S) start ref aminer $mode ===" >> "$LOG"
  timeout 7000 python tools/run_reference.py --dataset aminer \
    --prop_mode "$mode" --runs 10 --data_dir build/refdata_synth \
    --out results/ref_synth_n10.jsonl >> "$LOG" 2>&1
  echo "=== $(date -u +%H:%M:%S) done ref aminer $mode rc=$? ===" >> "$LOG"
done
for mode in avg single; do
  echo "=== $(date -u +%H:%M:%S) start grandtpu aminer $mode ===" >> "$LOG"
  GRANDTPU_DATA_DIR=build/refdata_synth timeout 7000 \
    python -m grandtpu.cli.main run --dataset aminer --prop-mode "$mode" \
    --platform cpu --seed1-runs 10 > /tmp/grandtpu_aminer_${mode}.out \
    2>> "$LOG"
  rc=$?
  if [ "$rc" -eq 0 ] && tail -1 /tmp/grandtpu_aminer_${mode}.out \
      | python -c 'import json,sys; json.loads(sys.stdin.read())' 2>/dev/null; then
    tail -1 /tmp/grandtpu_aminer_${mode}.out >> results/grandtpu_synth_n10.jsonl
  else
    echo "!!! aminer $mode rc=$rc — summary NOT appended" >> "$LOG"
  fi
  cat /tmp/grandtpu_aminer_${mode}.out >> "$LOG"
  echo "=== $(date -u +%H:%M:%S) done grandtpu aminer $mode rc=$rc ===" >> "$LOG"
done
echo "=== QUEUE COMPLETE ===" >> "$LOG"
