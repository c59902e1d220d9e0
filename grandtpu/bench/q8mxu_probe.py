"""Adjudicate the true-int8-MXU SpMM variant on hardware (VERDICT r3 #4).

The shipped int8 path gathers int8 rows but casts to bf16 for the one-hot
matmul (``sparse/spmm.py:_block_step_q8``). For the production propagation
operator D^-1 A the edge values are row-constant, so the matmul can run as
exact int8 x int8 -> int32 on the MXU (2x the bf16 MXU rate on v5e) with
the value applied per-row afterwards (``spmm_split_q8mxu``). If the kernel
is purely gather-bound this buys nothing; measure, keep only if it wins
(the Pallas-DropNode adjudication policy).

    python -m grandtpu.bench.q8mxu_probe [--n 300000] [--deg 30]
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=300_000)
    ap.add_argument("--deg", type=int, default=30)
    ap.add_argument("--f", type=int, default=128)
    ap.add_argument("--order", type=int, default=5)
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--rs", default="288,512",
                    help="rows_per_block values to sweep")
    # 'int8cast' FORCES the legacy bf16-cast matmul (plain 'int8' auto-
    # upgrades to the MXU kernel on row-constant operators since r4, so
    # the two arms must name the kernels explicitly to measure anything)
    ap.add_argument("--precisions", default="int8cast,int8mxu")
    ap.add_argument("--no-host", action="store_true",
                    help="skip the host-scipy reference (err reported as "
                    "-1): at 5M nodes the contended-host scipy pass alone "
                    "busts timeouts, and the 5M errors are already "
                    "characterized (RESULTS.md) — only the speed ranking "
                    "is in question")
    args = ap.parse_args()

    import numpy as np

    import jax
    import jax.numpy as jnp

    from grandtpu.bench.driver import bench_host_scipy, build_graph
    from grandtpu.infer import Propagator

    adj, feats = build_graph(n=args.n, avg_degree=args.deg, f=args.f)
    host_out, scale = None, 1.0
    if not args.no_host:
        _, host_out = bench_host_scipy(adj, feats, order=args.order)
        scale = max(np.max(np.abs(host_out)), 1e-9)
    x = jnp.asarray(feats)
    jax.block_until_ready(x)

    def sync(o):
        jax.block_until_ready(o)
        return float(jnp.sum(o[:1, :1]))

    results = []
    for r in (int(s) for s in args.rs.split(",")):
        prop = Propagator(adj, backend="block", rows_per_block=r)
        for prec in args.precisions.split(","):
            t0 = time.time()
            out = prop(x, mode="ppr", order=args.order, precision=prec)
            sync(out)
            compile_s = time.time() - t0
            t0 = time.time()
            for _ in range(args.repeats):
                out = prop(x, mode="ppr", order=args.order, precision=prec)
            sync(out)
            per_call = (time.time() - t0) / args.repeats
            eps = adj.nnz * args.order / per_call
            err = (float(np.max(np.abs(np.asarray(out) - host_out)) / scale)
                   if host_out is not None else -1.0)
            row = {"precision": prec, "rows_per_block": r,
                   "edges_per_s": eps, "rel_err": err,
                   "compile_s": round(compile_s, 1)}
            results.append(row)
            log(json.dumps(row))
    best = max(results, key=lambda r: r["edges_per_s"])
    print(json.dumps({"probe": "q8mxu", "n": args.n, "deg": args.deg,
                      "f": args.f, "results": results, "best": best}),
          flush=True)


if __name__ == "__main__":
    main()
