"""Calibrate the halo-vs-all_gather dispatch threshold (VERDICT r3 #8).

``dist_exact_propagate`` picks the halo variant when
``estimate_halo_compression(adj, S) < halo_threshold`` (default 0.5). The
estimator itself is exact (pinned against the built graph in
``tests/test_dist.py``); what lacked provenance is the THRESHOLD. This
harness sweeps shard counts x degrees on the virtual CPU mesh, records
the estimated compression and the measured per-variant time, and reports
which variant wins per cell — the crossover compression pins the default.

Caveat recorded with the numbers: CPU-mesh collective timings are a proxy
(XLA:CPU thread-copies, not ICI DMA); the halo variant's win region can
only widen on real ICI because its advantage is moved BYTES, and ICI
bandwidth per exchanged byte is the scarce resource the estimator models.
Re-run on real multi-chip hardware when available.

    python -m grandtpu.bench.halo_crossover
"""

from __future__ import annotations

import json
import sys
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=16384)
    ap.add_argument("--f", type=int, default=64)
    ap.add_argument("--order", type=int, default=5)
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    import os
    if "xla_force_host_platform_device_count" not in os.environ.get(
            "XLA_FLAGS", ""):
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                                   + " --xla_force_host_platform_device_count=8")
    import numpy as np
    import scipy.sparse as sp

    import jax
    jax.config.update("jax_platforms", "cpu")

    from grandtpu.data import synthetic_graph
    from grandtpu.dist import make_mesh
    from grandtpu.dist.halo import (HaloPropagator, HaloShardedGraph,
                                    estimate_halo_compression)
    from grandtpu.dist.spmm_shard import (BlockShardedGraph,
                                          BlockShardedPropagator)

    rows = []
    for deg in (4, 10, 30):
        adj, feats, _ = synthetic_graph(num_nodes=args.n, num_classes=4,
                                        num_features=args.f,
                                        avg_degree=deg, seed=0)
        adj = (adj + sp.eye(args.n, format="csr")).tocsr()
        x = np.asarray(feats, np.float32)
        for s in (2, 4, 8):
            mesh = make_mesh(n_data=s, n_model=1,
                             devices=jax.devices()[:s])
            comp = estimate_halo_compression(adj, s)

            def run(makeprop, label):
                prop = makeprop()
                out = prop(x, mode="ppr", order=args.order, alpha=0.2)
                t0 = time.time()
                for _ in range(args.repeats):
                    out = prop(x, mode="ppr", order=args.order, alpha=0.2)
                dt = (time.time() - t0) / args.repeats
                return dt, out

            t_halo, o1 = run(lambda: HaloPropagator(
                mesh, HaloShardedGraph.build(adj, num_shards=s)), "halo")
            t_ag, o2 = run(lambda: BlockShardedPropagator(
                mesh, BlockShardedGraph.build(adj, num_shards=s)), "ag")
            assert np.allclose(o1, o2, atol=1e-4)
            row = {"deg": deg, "shards": s,
                   "compression": round(float(comp), 4),
                   "halo_ms": round(t_halo * 1e3, 1),
                   "all_gather_ms": round(t_ag * 1e3, 1),
                   "winner": "halo" if t_halo < t_ag else "all_gather"}
            rows.append(row)
            log(json.dumps(row))
    print(json.dumps({"probe": "halo_crossover", "n": args.n, "f": args.f,
                      "rows": rows}), flush=True)


if __name__ == "__main__":
    main()
