"""Scaling sweep: edges/s of the row-partitioned propagation vs shard count.

On a real pod slice this produces the 1->2 host scaling-efficiency gate
(BASELINE.md: >=80% on Amazon2M). With one chip or virtual CPU devices the
absolute numbers are not meaningful, but the harness and its output format
are the production artifact:

    python -m grandtpu.bench.scaling            # uses all visible devices
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np
import scipy.sparse as sp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def bench_scaling(n=100_000, avg_degree=20, f=128, order=5,
                  shard_counts=None, repeats=3, variant="all_gather"):
    """variant: 'block' (BlockShardedPropagator — the production
    all_gather path on the one-hot-matmul kernel), 'all_gather' (the
    scatter-add reference implementation), 'halo' (all_to_all boundary
    exchange overlapped with the diagonal blocks), or 'both'/'all' —
    crossover curves (the halo row also reports its comm-compression
    ratio)."""
    import jax

    from grandtpu.data import synthetic_graph
    from grandtpu.dist import (BlockShardedGraph, BlockShardedPropagator,
                               HaloPropagator, HaloShardedGraph,
                               ShardedGraph, make_mesh)
    from grandtpu.dist.spmm_shard import ShardedPropagator

    n_dev = len(jax.devices())
    if shard_counts is None:
        shard_counts = [s for s in (1, 2, 4, 8, 16, 32)
                        if s <= n_dev]
    variants = {"both": ("block", "halo"),
                "all": ("block", "all_gather", "halo")}.get(
                    variant, (variant,))
    adj, _, _ = synthetic_graph(num_nodes=n, num_classes=8, num_features=4,
                                avg_degree=avg_degree, seed=0)
    adj = (adj + sp.eye(n, format="csr")).tocsr()
    rs = np.random.RandomState(1)
    feats = rs.rand(n, f).astype(np.float32)
    log(f"graph n={n} nnz={adj.nnz} f={f}; devices={n_dev}")

    results = []
    base = {}
    for s in shard_counts:
        mesh = make_mesh(n_data=s, n_model=1,
                         devices=jax.devices()[:s])
        for var in variants:
            row = {"shards": s, "variant": var}
            if var == "halo":
                if s == 1:
                    continue   # no remote columns to exchange
                hg = HaloShardedGraph.build(adj, num_shards=s)
                prop = HaloPropagator(mesh, hg)
                row["compression"] = hg.compression
            elif var == "block":
                bg = BlockShardedGraph.build(adj, num_shards=s)
                prop = BlockShardedPropagator(mesh, bg)
            else:
                g = ShardedGraph.build(adj, num_shards=s)
                prop = ShardedPropagator(mesh, g)
            x_dev = prop.place(feats)  # operator + features resident once
            prop(x_dev, mode="ppr", order=order)  # warm/compile
            times = []
            for _ in range(repeats):
                t0 = time.time()
                prop(x_dev, mode="ppr", order=order)
                times.append(time.time() - t0)
            eps = adj.nnz * order / min(times)
            # efficiency = per-shard throughput vs this variant's first
            # measured shard count
            base.setdefault(var, eps / s)
            row.update(edges_per_s=eps,
                       scaling_efficiency=(eps / s) / base[var])
            results.append(row)
            print(json.dumps(row), flush=True)
    return results


def bench_halo_build(n=2_000_000, avg_degree=10, num_shards=64):
    """Build-time benchmark for the vectorized HaloShardedGraph.build
    (VERDICT r1 item 6: seconds, not minutes, at 2M nodes / 64 shards).
    Measured r2 on the 2-core host: ~18s for 16M edges / 64 shards,
    send_idx 56MB, compression 0.11 vs all_gather."""
    from grandtpu.data import synthetic_graph
    from grandtpu.dist import HaloShardedGraph, estimate_halo_compression

    adj, _, _ = synthetic_graph(num_nodes=n, num_classes=8, num_features=4,
                                avg_degree=avg_degree, seed=0)
    adj = (adj + sp.eye(n, format="csr")).tocsr()
    t0 = time.time()
    est = estimate_halo_compression(adj, num_shards)
    decision_s = time.time() - t0
    t0 = time.time()
    g = HaloShardedGraph.build(adj, num_shards=num_shards)
    dt = time.time() - t0
    row = {"nodes": n, "nnz": int(adj.nnz), "shards": num_shards,
           "build_s": dt, "decision_s": decision_s, "c_max": g.halo_per_pair,
           "send_idx_mb": g.send_idx.size * 4 / 1e6,
           "compression": g.compression, "compression_est": est}
    print(json.dumps(row), flush=True)
    return row


if __name__ == "__main__":
    import sys as _sys
    arg = _sys.argv[1] if len(_sys.argv) > 1 else "all_gather"
    if arg == "halo-build":
        bench_halo_build()
    else:
        bench_scaling(variant=arg)
