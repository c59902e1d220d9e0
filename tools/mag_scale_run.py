"""Sparse (MAG) engine at the reference's flagship scale (VERDICT r4 #1).

MAG-Scholar-C is 12.4M nodes / ~173M undirected edges / 2.78M-dim sparse
bag-of-words features / 8 classes (reference ``utils/data_loader.py:65-83``;
the dataset ``model_mag.py`` exists for). The data itself is egress-blocked,
so this runs a full-scale synthetic stand-in with the exact same shape
through the COMPLETE mag_scholar_c ppr preset (``scripts/run_mag.sh``):

1. native GFPush precompute over train + val + 10K-unlabeled sources,
2. vocab-padded sparse training (embedding table 2.78M x 64 + Adam moments
   on device),
3. embedding-space exact predict over ALL rows (the model_mag.py:192-233
   memory trick, here as a single-chip [12.4M, 64] power iteration).

Records precompute time, batch-time median, total time, test accuracy, and
peak device memory to ``results/mag_scale_r5.json``. Run ON THE CHIP (one
process at a time — CLAUDE.md):

    python tools/mag_scale_run.py [--n 12400000] [--vocab 2780000]
        [--deg 18] [--predict-precision bf16_carry] [--scale 1.0]

--scale 0.1 shrinks n/vocab 10x for a dry run.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=12_400_000)
    ap.add_argument("--vocab", type=int, default=2_780_000)
    ap.add_argument("--classes", type=int, default=8)
    ap.add_argument("--deg", type=float, default=18.0)
    ap.add_argument("--feature-nnz", type=int, default=24)
    ap.add_argument("--token-skew", type=float, default=2.0,
                    help="Zipf-like in-band token skew (0 = uniform; at "
                         "MAG vocab scale uniform bands leave every word "
                         "seen ~once in training -> chance accuracy)")
    ap.add_argument("--scale", type=float, default=1.0,
                    help="shrink n and vocab by this factor (dry runs)")
    ap.add_argument("--predict-precision", default="bf16_carry")
    ap.add_argument("--epochs", type=int, default=5000)
    ap.add_argument("--platform", default=None,
                    help="cpu forces the host backend (dry runs)")
    ap.add_argument("--out", default="results/mag_scale_r5.json")
    args = ap.parse_args()
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    n = int(args.n * args.scale)
    vocab = int(args.vocab * args.scale)

    from grandtpu.config import PRESETS
    from grandtpu.data.registry import _split_stratified
    from grandtpu.data.synthetic import synthetic_graph
    from grandtpu.train.trainer_sparse import train_sparse

    t0 = time.time()
    adj, feats, labels = synthetic_graph(
        num_nodes=n, num_classes=args.classes, num_features=vocab,
        avg_degree=args.deg, sparse_features=True,
        feature_nnz=args.feature_nnz, token_skew=args.token_skew, seed=7)
    build_s = time.time() - t0
    log(f"graph: n={n} nnz={adj.nnz} vocab={vocab} "
        f"feat_nnz={feats.nnz} built in {build_s:.1f}s")

    t0 = time.time()
    data = _split_stratified(adj, feats, labels, split_seed=42,
                             name=f"mag-scale-synth-{n}")
    split_s = time.time() - t0
    log(f"splits: train={len(data.idx_train)} val={len(data.idx_val)} "
        f"test={len(data.idx_test)} in {split_s:.1f}s")

    cfg = PRESETS["mag_scholar_c"].replace(
        dataset=data.name, push_backend="native", epochs=args.epochs,
        predict_precision=args.predict_precision, visible=True)
    log(f"preset: mag_scholar_c ppr, predict_precision="
        f"{cfg.predict_precision}")

    t0 = time.time()
    r = train_sparse(cfg, data=data, log=log)
    run_s = time.time() - t0

    mem = {}
    try:
        import jax
        stats = jax.local_devices()[0].memory_stats() or {}
        mem = {k: int(v) for k, v in stats.items()
               if "bytes" in k or "size" in k}
    except Exception as e:   # memory_stats is backend-optional
        log(f"memory_stats unavailable: {e}")

    row = {
        "metric": "mag_scale_run",
        "n": n, "adj_nnz": int(adj.nnz), "vocab": vocab,
        "feat_nnz": int(feats.nnz), "token_skew": args.token_skew,
        "preset": "mag_scholar_c/ppr",
        "predict_precision": cfg.predict_precision,
        "test_acc": r.test_acc,
        "best_val_acc": r.best_val_acc,
        "num_batches": r.num_batches,
        "preprocess_s": round(r.preprocess_time, 1),
        "batch_time_median_s": round(r.batch_time_median, 5),
        "batch_time_mean_s": round(r.batch_time_avg, 5),
        "total_train_s": round(run_s, 1),
        "graph_build_s": round(build_s, 1),
        "split_s": round(split_s, 1),
        "peak_bytes_in_use": mem.get("peak_bytes_in_use"),
        "device_memory": mem,
    }
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "a") as fh:
        fh.write(json.dumps(row) + "\n")
    print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
