#!/bin/bash
# Round-4 cross-engine parity: N=10 runs of BOTH engines on the identical
# synthetic dumps (build/refdata_synth, tools/make_synth_ref_data.py).
# Usage: tools/synth_parity_queue.sh {ref|grandtpu}
set -u
cd /root/repo
side=$1
LOG=/root/repo/build/synth_parity_${side}.log
: > "$LOG"
if [ "$side" = ref ]; then
  OUT=/root/repo/results/ref_synth_n10.jsonl
  for ds in aminer pubmed mag_scholar_c Amazon2M reddit; do
    echo "=== $(date -u +%H:%M:%S) start $ds ===" >> "$LOG"
    timeout 14000 python tools/run_reference.py --dataset "$ds" \
      --prop_mode ppr --runs 10 --data_dir build/refdata_synth \
      --out "$OUT" >> "$LOG" 2>&1
    echo "=== $(date -u +%H:%M:%S) done $ds rc=$? ===" >> "$LOG"
  done
else
  OUT=/root/repo/results/grandtpu_synth_n10.jsonl
  for ds in aminer pubmed mag_scholar_c Amazon2M reddit; do
    if [ "$ds" = pubmed ]; then seeds="--seed2-runs 10"; else seeds="--seed1-runs 10"; fi
    echo "=== $(date -u +%H:%M:%S) start $ds ===" >> "$LOG"
    GRANDTPU_DATA_DIR=build/refdata_synth timeout 14000 \
      python -m grandtpu.cli.main run --dataset "$ds" --platform cpu \
      $seeds > /tmp/grandtpu_${ds}.out 2>> "$LOG"
    rc=$?
    # only a clean run's summary line goes into the evidence file — a
    # timeout/crash leaves a partial last line that would corrupt the jsonl
    if [ "$rc" -eq 0 ] && tail -1 /tmp/grandtpu_${ds}.out \
        | python -c 'import json,sys; json.loads(sys.stdin.read())' 2>/dev/null; then
      tail -1 /tmp/grandtpu_${ds}.out >> "$OUT"
    else
      echo "!!! $ds rc=$rc — summary NOT appended" >> "$LOG"
    fi
    cat /tmp/grandtpu_${ds}.out >> "$LOG"
    echo "=== $(date -u +%H:%M:%S) done $ds rc=$rc ===" >> "$LOG"
  done
fi
echo "=== QUEUE COMPLETE ===" >> "$LOG"
