"""GFPush throughput: native C++/OpenMP (host) vs batched JAX push (TPU).

The reference runs its kernel on 40 CPU threads (``graph.h:41``); here the
native kernel uses whatever cores exist, and the TPU formulation trades the
irregular per-source walk for dense [B, n] hops on the MXU. Prints one JSON
line per backend: sources/s plus the settings.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np
import scipy.sparse as sp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build(n=300_000, avg_degree=30, seed=0):
    from grandtpu.data import synthetic_graph
    adj, _, _ = synthetic_graph(num_nodes=n, num_classes=8, num_features=4,
                                avg_degree=avg_degree, seed=seed)
    return (adj + sp.eye(n, format="csr")).tocsr()


def bench_push(n=300_000, n_src=1024, order=10, alpha=0.2, rmax=1e-5,
               k=64, repeats=3, backends=("native", "bucket"),
               block=1024, window=8):
    from grandtpu.ppr import build_coef
    adj = build(n=n)
    indptr = adj.indptr.astype(np.int32)
    indices = adj.indices.astype(np.int32)
    sources = np.arange(n_src, dtype=np.int32) * (n // n_src)
    coef = build_coef("ppr", order, alpha)
    results = {}
    for backend in backends:
        if backend == "native":
            from grandtpu.ppr.native import gfpush_native
            fn = lambda: gfpush_native(indptr, indices, sources, coef,
                                       rmax, k)
        elif backend == "bucket":
            from grandtpu.ppr.bucket_push import (BucketPushGraph,
                                                  gfpush_bucketed)
            g = BucketPushGraph(indptr, indices, rmax, window=window)
            fn = lambda: gfpush_bucketed(indptr, indices, sources, coef,
                                         rmax, k, block=block, window=window,
                                         graph=g)
        else:
            from grandtpu.ppr.jax_push import gfpush_jax
            fn = lambda: gfpush_jax(indptr, indices, sources, coef, rmax,
                                    k, block=512, dense_threshold=0)
        t0 = time.time()
        fn()
        log(f"{backend}: first call (incl compile/build) "
            f"{time.time() - t0:.1f}s")
        times = []
        for _ in range(repeats):
            t0 = time.time()
            fn()
            times.append(time.time() - t0)
        best = min(times)
        sps = n_src / best
        results[backend] = sps
        row = {"metric": f"gfpush_{backend}_sources_per_s",
               "value": sps, "unit": "sources/s",
               "n": n, "order": order, "rmax": rmax, "k": k}
        if backend == "bucket":
            row.update(block=block, window=window)
        print(json.dumps(row), flush=True)
    return results


def main() -> None:
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=300_000)
    ap.add_argument("--n-src", type=int, default=1024)
    ap.add_argument("--order", type=int, default=10)
    ap.add_argument("--rmax", type=float, default=1e-5)
    ap.add_argument("--k", type=int, default=64)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--block", type=int, default=1024)
    ap.add_argument("--window", type=int, default=8)
    ap.add_argument("--backends", default="native,bucket",
                    help="comma list: native,bucket,jax")
    args = ap.parse_args()
    bench_push(n=args.n, n_src=args.n_src, order=args.order, rmax=args.rmax,
               k=args.k, repeats=args.repeats, block=args.block,
               window=args.window,
               backends=tuple(args.backends.split(",")))


if __name__ == "__main__":
    main()
