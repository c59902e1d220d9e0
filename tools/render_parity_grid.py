"""Render the cross-engine synthetic parity grid from the raw run files.

Reads ``results/ref_synth_n10.jsonl`` and ``results/grandtpu_synth_n10.jsonl``
and prints the dataset x prop-mode table (mean +- std both engines, and
|delta|/sigma with sigma = max of the two stds) exactly as quoted in
RESULTS.md — so every table cell is one command away from its evidence.

    python tools/render_parity_grid.py
"""

from __future__ import annotations

import json

REF = "results/ref_synth_n10.jsonl"
GT = "results/grandtpu_synth_n10.jsonl"


def _load(path, mean_key, std_key):
    out = {}
    for line in open(path):
        d = json.loads(line)
        key = (d["dataset"], d["prop_mode"])
        if key in out:
            # appended re-runs happen; last-wins is the convention, but it
            # must be visible so stale evidence can't silently replace cells
            import sys
            print(f"WARNING: duplicate cell {key} in {path} — using the "
                  f"last occurrence", file=sys.stderr)
        out[key] = (d[mean_key], d[std_key])
    return out


def main():
    ref = _load(REF, "mean", "std")
    gt = _load(GT, "test_acc_mean", "test_acc_std")
    print(f"{'preset':16s} {'mode':7s} {'reference':>15s} "
          f"{'grandtpu':>15s} {'d/sigma':>8s}")
    worst = 0.0
    for key in sorted(set(ref) | set(gt),
                      key=lambda k: (k[0].lower(), k[1])):
        if key not in ref:
            gm, gs = gt[key]
            print(f"{key[0]:16s} {key[1]:7s} (no reference run) "
                  f"{gm*100:6.2f}% +-{gs*100:5.2f}")
            continue
        rm, rs = ref[key]
        if key not in gt:
            print(f"{key[0]:16s} {key[1]:7s} "
                  f"{rm*100:6.2f}% +-{rs*100:5.2f}   (no grandtpu run)")
            continue
        gm, gs = gt[key]
        ds = abs(gm - rm) / max(rs, gs, 1e-9)
        worst = max(worst, ds)
        print(f"{key[0]:16s} {key[1]:7s} "
              f"{rm*100:6.2f}% +-{rs*100:5.2f} "
              f"{gm*100:6.2f}% +-{gs*100:5.2f} {ds:8.2f}")
    paired = len(set(ref) & set(gt))
    print(f"\ncells: {paired} paired / {len(set(ref) | set(gt))} total"
          f"   worst |delta|/sigma: {worst:.2f}"
          f"   all within 1 sigma: {worst <= 1.0}")


if __name__ == "__main__":
    main()
