"""Per-block unique-column gather dedup probe (VERDICT r4 #3).

The roofline reconciliation proved the SpMM kernels run within 7% of their
perfect-locality SOL and are per-gathered-ROW bound — so the one remaining
formulation lever is gathering FEWER rows. On graphs with high IN-degree
hubs, a popular column appears in many edges of the same row block; this
probe gathers each block's ``unique(cols)`` once from HBM ([U, F]) and
re-expands locally via a second gather from that small buffer, vs the
production kernels' direct [E_b, F] gather.

The dedup tables are built host-side at operator-build time (the layout is
static), so the kernel change is purely: one big gather [E_b] -> one
smaller gather [U] + one local gather [E_b] from [U, F].

Graphs probed:
- uniform bench graph (unique ratio ~1: dedup should LOSE — measures the
  re-expand overhead),
- in-degree-skew graph (hub COLUMNS with many incoming edges: the
  dedup-friendly case the probe exists for),
at F=128 and F=602, int8-MXU and bf16 flavors.

    python -m grandtpu.bench.dedup_probe [--n 300000] [--repeats 5]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build_dedup_tables(bcsr, u_pad_multiple: int = 128):
    """Host-side per-block unique-column tables for a BlockCSR.

    Returns (u_cols [nb, U_max] int32, local_idx [nb, E_b] int32,
    unique_ratio). Padding slots (cols=0) fold into the unique 0 entry;
    their lrow=R already excludes them from the one-hot matmul."""
    import jax.numpy as jnp

    cols = np.asarray(bcsr.cols)
    nb, eb = cols.shape
    us, invs = [], np.empty((nb, eb), np.int32)
    for b in range(nb):
        u, inv = np.unique(cols[b], return_inverse=True)
        us.append(u)
        invs[b] = inv.astype(np.int32)
    u_max = max(u.shape[0] for u in us)
    u_max = -(-u_max // u_pad_multiple) * u_pad_multiple
    u_tab = np.zeros((nb, u_max), np.int32)
    for b, u in enumerate(us):
        u_tab[b, : u.shape[0]] = u
    nnz = float((np.asarray(bcsr.vals) != 0).sum())
    ratio = sum(u.shape[0] for u in us) / max(nnz, 1.0)
    return jnp.asarray(u_tab), jnp.asarray(invs), ratio


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=300_000)
    ap.add_argument("--deg", type=int, default=30)
    ap.add_argument("--hub-cols", type=int, default=200)
    ap.add_argument("--hub-indeg", type=int, default=15_000)
    ap.add_argument("--fs", default="128,602")
    ap.add_argument("--graphs", default="uniform,in-skew")
    ap.add_argument("--precisions", default="int8mxu,bf16")
    # single-apply timings (edges/s is per-apply; an order-N loop would
    # scale both arms identically since the quantize pass is shared)
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--r-int8", type=int, default=288)
    ap.add_argument("--r-bf16", type=int, default=512)
    args = ap.parse_args()

    import scipy.sparse as sp

    import jax
    import jax.numpy as jnp

    from grandtpu.bench.driver import build_graph
    from grandtpu.sparse.spmm import (BlockCSR, _block_step_q8mxu,
                                      quantize_columns)

    def sync(o):
        jax.block_until_ready(o)
        return float(jnp.sum(o[:1, :1].astype(jnp.float32)))

    def make_graph(skew: bool):
        adj, _ = build_graph(n=args.n, avg_degree=args.deg, f=4)
        if skew:
            # hub COLUMNS: many random rows point at few popular targets —
            # the in-degree skew that creates in-block duplicate cols
            rs = np.random.RandomState(11)
            hub_cols = np.tile(rs.choice(args.n, args.hub_cols,
                                         replace=False), args.hub_indeg)
            hub_rows = rs.randint(0, args.n,
                                  hub_cols.size)
            extra = sp.coo_matrix(
                (np.ones(hub_rows.size, np.float32), (hub_rows, hub_cols)),
                shape=adj.shape)
            adj = (adj + extra.tocsr()).tocsr()
            adj.data[:] = 1.0
        return adj

    def bench_kernel(apply_fn, operands, nnz, label):
        t0 = time.time()
        out = apply_fn(*operands)
        sync(out)
        compile_s = time.time() - t0
        t0 = time.time()
        for _ in range(args.repeats):
            out = apply_fn(*operands)
        sync(out)
        per_call = (time.time() - t0) / args.repeats
        eps = nnz / per_call
        log(f"  {label}: {per_call*1000:.1f}ms/apply -> {eps:.3e} edges/s "
            f"(compile {compile_s:.1f}s)")
        return eps

    results = []
    wanted = args.graphs.split(",")
    for skew in (False, True):
        if ("in-skew" if skew else "uniform") not in wanted:
            continue
        adj = make_graph(skew)
        deg = np.asarray(adj.sum(1)).flatten()
        a_norm = sp.diags(1.0 / np.maximum(deg, 1e-12)).dot(adj).tocsr()
        nnz = adj.nnz
        for f in (int(s) for s in args.fs.split(",")):
            rs = np.random.RandomState(1)
            x = jnp.asarray(rs.rand(args.n, f).astype(np.float32))
            jax.block_until_ready(x)
            for prec, rpb in (("int8mxu", args.r_int8),
                              ("bf16", args.r_bf16)):
                if prec not in args.precisions.split(","):
                    continue
                bcsr = BlockCSR.from_scipy(a_norm, rows_per_block=rpb)
                u_tab, l_idx, ratio = build_dedup_tables(bcsr)
                iota = jnp.arange(rpb, dtype=jnp.int32)[:, None]
                n_pad = bcsr.num_blocks * rpb
                xp = jnp.pad(x, ((0, n_pad - args.n), (0, 0)))

                if prec == "int8mxu":
                    x_q, _ = quantize_columns(xp)
                    jax.block_until_ready(x_q)

                    @jax.jit
                    def base(x_q, cols, lrow, iota=iota):
                        def step(_, blk):
                            c, lr = blk
                            return None, _block_step_q8mxu(x_q, iota, c, lr)
                        _, outs = jax.lax.scan(step, None, (cols, lrow),
                                               unroll=4)
                        return outs.reshape(n_pad, f)

                    @jax.jit
                    def dedup(x_q, u_tab, l_idx, lrow, iota=iota):
                        def step(_, blk):
                            uc, li, lr = blk
                            u_feat = jnp.take(x_q, uc, axis=0)   # [U, F]
                            feats = jnp.take(u_feat, li, axis=0)
                            onehot = (lr[None, :] == iota).astype(jnp.int8)
                            return None, jax.lax.dot_general(
                                onehot, feats, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
                        _, outs = jax.lax.scan(
                            step, None, (u_tab, l_idx, lrow), unroll=4)
                        return outs.reshape(n_pad, f)

                    eps_base = bench_kernel(base, (x_q, bcsr.cols, bcsr.lrow),
                                            nnz, f"{prec} base")
                    eps_dd = bench_kernel(dedup,
                                          (x_q, u_tab, l_idx, bcsr.lrow),
                                          nnz, f"{prec} dedup")
                else:
                    @jax.jit
                    def base(xp, cols, vals, lrow, iota=iota):
                        def step(_, blk):
                            c, v, lr = blk
                            feats = (jnp.take(xp, c, axis=0)
                                     * v[:, None]).astype(jnp.bfloat16)
                            onehot = (lr[None, :] == iota).astype(
                                jnp.bfloat16)
                            return None, jnp.dot(
                                onehot, feats,
                                preferred_element_type=jnp.float32)
                        _, outs = jax.lax.scan(
                            step, None, (cols, vals, lrow), unroll=4)
                        return outs.reshape(n_pad, f)

                    @jax.jit
                    def dedup(xp, u_tab, l_idx, vals, lrow, iota=iota):
                        def step(_, blk):
                            uc, li, v, lr = blk
                            u_feat = jnp.take(xp, uc, axis=0)     # [U, F]
                            feats = (jnp.take(u_feat, li, axis=0)
                                     * v[:, None]).astype(jnp.bfloat16)
                            onehot = (lr[None, :] == iota).astype(
                                jnp.bfloat16)
                            return None, jnp.dot(
                                onehot, feats,
                                preferred_element_type=jnp.float32)
                        _, outs = jax.lax.scan(
                            step, None, (u_tab, l_idx, vals, lrow),
                            unroll=4)
                        return outs.reshape(n_pad, f)

                    eps_base = bench_kernel(
                        base, (xp, bcsr.cols, bcsr.vals, bcsr.lrow), nnz,
                        f"{prec} base")
                    eps_dd = bench_kernel(
                        dedup, (xp, u_tab, l_idx, bcsr.vals, bcsr.lrow), nnz,
                        f"{prec} dedup")
                row = {"graph": "in-skew" if skew else "uniform",
                       "nnz": int(nnz), "f": f, "precision": prec,
                       "rows_per_block": rpb,
                       "unique_ratio": round(ratio, 4),
                       "u_max": int(u_tab.shape[1]),
                       "eb": int(np.asarray(bcsr.cols).shape[1]),
                       "base_edges_per_s": eps_base,
                       "dedup_edges_per_s": eps_dd,
                       "dedup_speedup": round(eps_dd / eps_base, 3)}
                results.append(row)
                log(json.dumps(row))
    print(json.dumps({"probe": "gather-dedup", "results": results}),
          flush=True)


if __name__ == "__main__":
    main()
