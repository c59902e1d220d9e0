"""Skewed-graph (power-law hub) SpMM re-measure.

The RESULTS.md skewed-graph row predates the int8 MXU upgrade; the
SplitCSR overflow levels have their own q8mxu variant
(``spmm_block_offset_q8mxu``), so hub-heavy graphs should see the same
kernel win as the uniform bench graph. Measures f32/bf16/int8cast/int8
(auto-MXU) on the r1/r3 skew construction: a uniform base graph plus
``hubs`` rows of ``hub_deg`` random neighbors.

    python -m grandtpu.bench.skew_probe [--n 300000] [--hubs 200]
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
    ap.add_argument("--deg", type=int, default=20)
    ap.add_argument("--hubs", type=int, default=200)
    ap.add_argument("--hub-deg", type=int, default=15_000)
    ap.add_argument("--f", type=int, default=128)
    ap.add_argument("--order", type=int, default=5)
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--r-int8", type=int, default=288)
    ap.add_argument("--precisions", default="f32,bf16,int8cast,int8")
    args = ap.parse_args()

    import numpy as np
    import scipy.sparse as sp

    import jax
    import jax.numpy as jnp

    from grandtpu.bench.driver import bench_host_scipy, build_graph
    from grandtpu.infer import Propagator

    adj, feats = build_graph(n=args.n, avg_degree=args.deg, f=args.f)
    rs = np.random.RandomState(7)
    hub_rows = np.repeat(rs.choice(args.n, args.hubs, replace=False),
                         args.hub_deg)
    hub_cols = rs.randint(0, args.n, hub_rows.size)
    hubs = sp.coo_matrix((np.ones(hub_rows.size, np.float32),
                          (hub_rows, hub_cols)), shape=adj.shape)
    adj = (adj + hubs.tocsr()).tocsr()
    adj.data[:] = 1.0   # re-binarize duplicate edges
    log(f"skewed graph: n={args.n} nnz={adj.nnz} "
        f"max_deg={int(np.diff(adj.indptr).max())}")
    _, host_out = bench_host_scipy(adj, feats, order=args.order)
    scale_ref = max(np.max(np.abs(host_out)), 1e-9)

    x = jnp.asarray(feats)
    jax.block_until_ready(x)

    def sync(o):
        jax.block_until_ready(o)
        return float(jnp.sum(o[:1, :1]))

    results = []
    for prec in args.precisions.split(","):
        r = args.r_int8 if prec.startswith("int8") else 512
        prop = Propagator(adj, backend="block", rows_per_block=r)
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
        err = float(np.max(np.abs(np.asarray(out) - host_out)) / scale_ref)
        row = {"precision": prec, "rows_per_block": r, "edges_per_s": eps,
               "rel_err": err, "compile_s": round(compile_s, 1)}
        results.append(row)
        log(json.dumps(row))
    print(json.dumps({"probe": "skew", "n": args.n, "nnz": int(adj.nnz),
                      "hubs": args.hubs, "hub_deg": args.hub_deg,
                      "f": args.f, "results": results}), flush=True)


if __name__ == "__main__":
    main()
