#!/bin/bash
# Round-4 follow-up: extend the cross-engine synthetic parity to the
# avg/single prop modes of every large-graph preset, completing the full
# 7-dataset x 3-mode grid (cora/citeseer modes landed in r3, the 5 ppr
# cells in r4, aminer avg/single earlier this session). Same protocol as
# tools/synth_parity_queue.sh: N=10 both engines on the identical dumps
# in build/refdata_synth. Cheapest cells first so partial completion is
# still usable evidence.
# Usage: tools/mode_parity_queue.sh [ds:mode ds:mode ...]
set -u
cd /root/repo
LOG=/root/repo/build/mode_parity.log
CELLS=${@:-"Amazon2M:single Amazon2M:avg reddit:single reddit:avg \
pubmed:single pubmed:avg mag_scholar_c:single mag_scholar_c:avg"}
: > "$LOG"
for cell in $CELLS; do
  ds=${cell%%:*}; mode=${cell##*:}
  echo "=== $(date -u +%H:%M:%S) start ref $ds $mode ===" >> "$LOG"
  timeout 7000 python tools/run_reference.py --dataset "$ds" \
    --prop_mode "$mode" --runs 10 --data_dir build/refdata_synth \
    --out results/ref_synth_n10.jsonl >> "$LOG" 2>&1
  echo "=== $(date -u +%H:%M:%S) done ref $ds $mode rc=$? ===" >> "$LOG"
  if [ "$ds" = pubmed ]; then seeds="--seed2-runs 10"; else seeds="--seed1-runs 10"; fi
  echo "=== $(date -u +%H:%M:%S) start grandtpu $ds $mode ===" >> "$LOG"
  GRANDTPU_DATA_DIR=build/refdata_synth timeout 7000 \
    python -m grandtpu.cli.main run --dataset "$ds" --prop-mode "$mode" \
    --platform cpu $seeds > /tmp/grandtpu_${ds}_${mode}.out 2>> "$LOG"
  rc=$?
  if [ "$rc" -eq 0 ] && tail -1 /tmp/grandtpu_${ds}_${mode}.out \
      | python -c 'import json,sys; json.loads(sys.stdin.read())' 2>/dev/null; then
    tail -1 /tmp/grandtpu_${ds}_${mode}.out >> results/grandtpu_synth_n10.jsonl
  else
    echo "!!! $ds $mode rc=$rc — summary NOT appended" >> "$LOG"
  fi
  cat /tmp/grandtpu_${ds}_${mode}.out >> "$LOG"
  echo "=== $(date -u +%H:%M:%S) done grandtpu $ds $mode rc=$rc ===" >> "$LOG"
done
echo "=== QUEUE COMPLETE ===" >> "$LOG"
