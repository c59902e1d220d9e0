#!/bin/bash
# Round-4 scale-run refresh: the four large-graph presets on their synth
# stand-ins (RESULTS.md "Scale runs" table), re-run to record the
# tunnel-robust batch_time_median alongside wall clock (VERDICT r3 #7).
# One run at a time — ONLY one process may use the chip (CLAUDE.md).
# Usage: tools/scale_queue.sh
set -u
cd /root/repo
OUTDIR=results/scale_r4
mkdir -p "$OUTDIR"
LOG=$OUTDIR/queue.log
: > "$LOG"
run_one() {
  local name=$1 preset=$2 spec=$3
  echo "=== $(date -u +%H:%M:%S) start $name ===" >> "$LOG"
  timeout 1800 python -m grandtpu.cli.main run \
    --preset "$preset" --dataset "$spec" \
    > "$OUTDIR/$name.out" 2> "$OUTDIR/$name.err"
  echo "=== $(date -u +%H:%M:%S) done $name rc=$? ===" >> "$LOG"
}
run_one reddit   reddit        synth:233000:41:602
run_one aminer   aminer        synth:593000:18:100
run_one mag      mag_scholar_c synth:1000000:8:20000:sparse
run_one amazon2m Amazon2M      synth:2000000:47:100
echo "=== QUEUE COMPLETE ===" >> "$LOG"
