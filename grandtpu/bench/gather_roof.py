"""Measure the TPU row-gather ceiling that bounds SpMM (VERDICT r1 #4/r2 #2).

The SplitCSR SpMM is gather-bound: every edge gathers one [F] feature row
(``sparse/spmm.py``). This harness measures the raw XLA row-gather rate as a
function of row WIDTH (F) and dtype, against the sequential-stream roof, to
answer which of two regimes holds on this chip:

- per-ROW bound: rows/s flat in F -> shrinking bytes (bf16/int8 packing)
  buys nothing, but WIDER rows are nearly free -> propagate more feature
  columns per gather pass (the real-workload win: predict() has F=602-1433).
- per-BYTE bound: rows/s ~ 1/F -> pack features to bf16/int8 with f32
  rescale to double/quadruple edges/s.

Each config runs the same chunked-scan shape as the production kernel
(gather a [E_b, F] slab per step, cheap reduce to keep it gather-dominated),
arrays device-resident, one scalar-fetch sync per measurement (tunnel-safe
timing per RESULTS.md).

    python -m grandtpu.bench.gather_roof
"""

from __future__ import annotations

import functools
import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _sync(x):
    import jax.numpy as jnp
    return float(jnp.sum(x[:1, :1] if x.ndim == 2 else x[:1]))


def bench_gather(n=300_000, e_total=6_600_000, e_b=11776, repeats=3,
                 fs=(64, 128, 256, 512), dtypes=("float32",)):
    import jax
    import jax.numpy as jnp

    rs = np.random.RandomState(0)
    idx_np = rs.randint(0, n, size=(e_total // e_b) * e_b).astype(np.int32)
    idx = jnp.asarray(idx_np.reshape(-1, e_b))
    rows = []

    @functools.partial(jax.jit, static_argnames=())
    def run(x, idx):
        def step(acc, ic):
            slab = jnp.take(x, ic, axis=0)
            return acc + jnp.sum(slab.astype(jnp.float32), axis=0), None

        acc0 = jnp.zeros((x.shape[1],), jnp.float32)
        acc, _ = jax.lax.scan(step, acc0, idx, unroll=4)
        return acc

    for dt in dtypes:
        for f in fs:
            # generate on DEVICE: uploading [n, 512] f32 through the
            # tunnel costs minutes and measures the network, not the chip
            x = jax.jit(
                lambda: jax.random.uniform(
                    jax.random.PRNGKey(0), (n, f)).astype(dt),
                static_argnames=())()
            jax.block_until_ready(x)
            out = run(x, idx)          # compile
            _sync(out)
            times = []
            for _ in range(repeats):
                t0 = time.time()
                out = run(x, idx)
                _sync(out)
                times.append(time.time() - t0)
            dtb = {"float32": 4, "bfloat16": 2, "int8": 1}[dt]
            rps = idx_np.size / min(times)
            row = {"metric": "gather_rows_per_s", "value": rps,
                   "f": f, "dtype": dt, "e_b": e_b,
                   "gb_per_s": rps * f * dtb / 1e9}
            rows.append(row)
            print(json.dumps(row), flush=True)
    return rows


def bench_stream(n=300_000, f=128, repeats=3):
    """Sequential-read roof: sum a [n, F] array (one clean HBM stream)."""
    import jax
    import jax.numpy as jnp

    reps = max(1, 6_600_000 // n)   # same total bytes as the gather config
    x = jax.jit(lambda: jax.random.uniform(
        jax.random.PRNGKey(1), (reps * n, f)))()
    jax.block_until_ready(x)

    @jax.jit
    def run(x):
        return jnp.sum(x, axis=0)

    _sync(run(x))
    times = []
    for _ in range(repeats):
        t0 = time.time()
        out = run(x)
        _sync(out)
        times.append(time.time() - t0)
    gbs = x.size * 4 / min(times) / 1e9
    row = {"metric": "hbm_stream_gb_per_s", "value": gbs,
           "rows_per_s_equiv": x.shape[0] / min(times)}
    print(json.dumps(row), flush=True)
    return row


def bench_gather_real(rs=(288, 512), f=128,
                      precisions=("f32", "bf16", "int8"), repeats=5):
    """Roofline for the production SpMM via its OWN kernel (r3 #3).

    Decoupled micro-gathers mislead here: a cheap-reduce consumer is
    reduce-bound for narrow dtypes (the r3 'int8 roof' of 164M rows/s sat
    BELOW the real kernel's 341M gathered slots/s — the paradox the
    verdict flagged). The honest speed-of-light is the SAME kernel with
    its indices replaced by perfect-locality iota cols: identical matmul
    and layout work, zero gather irregularity. Reported per precision and
    block size: per-apply time real vs iota, gathered GB/s, and
    %-of-SOL = t_iota / t_real.
    """
    import numpy as np

    import jax
    import jax.numpy as jnp

    from grandtpu.bench.driver import build_graph
    from grandtpu.infer import Propagator
    from grandtpu.sparse.spmm import (BlockCSR, SplitCSR, spmm_split,
                                      spmm_split_q8mxu)

    adj, _ = build_graph(f=4)
    rows = []
    for r in rs:
        prop = Propagator(adj, backend="block", rows_per_block=r)
        scsr = prop.adj_op
        base = scsr.base
        nb, eb = base.cols.shape
        n_pad = scsr.num_blocks * r
        pad_overhead = float(scsr.pad_overhead)
        # perfect-locality variant: block b reads rows [b*eb % n_pad ...)
        iota_np = ((np.arange(nb)[:, None] * eb
                    + np.arange(eb)[None, :]) % n_pad).astype(np.int32)
        base_iota = BlockCSR(jnp.asarray(iota_np), base.vals, base.lrow,
                             base.num_nodes, r)
        scsr_iota = SplitCSR(base_iota, scsr.levels, scsr.num_nodes)
        log(f"R={r}: blocks=({nb},{eb}) pad_overhead={pad_overhead:.3f}")

        x = jax.jit(lambda: jax.random.uniform(
            jax.random.PRNGKey(0), (n_pad, f)))()
        jax.block_until_ready(x)

        def apply_fn(op, prec):
            if prec == "int8":
                return spmm_split_q8mxu(op, x, prop.row_val, trim=False)
            return spmm_split(op, x, fast=prec == "bf16", trim=False)

        for prec in precisions:
            times = {}
            for name, op in (("real", scsr), ("iota", scsr_iota)):
                out = apply_fn(op, prec)
                _sync(out)
                t0 = time.time()
                for _ in range(repeats):
                    out = apply_fn(op, prec)
                _sync(out)
                times[name] = (time.time() - t0) / repeats
            bytes_per_row = {"f32": 4 * f, "bf16": 2 * f, "int8": f}[prec]
            slots_per_s = nb * eb / times["real"]
            row = {"metric": "spmm_roofline", "precision": prec,
                   "rows_per_block": r,
                   "real_ms": round(times["real"] * 1e3, 2),
                   "iota_ms": round(times["iota"] * 1e3, 2),
                   "pct_of_sol": round(100 * times["iota"]
                                       / times["real"], 1),
                   "slots_per_s": round(slots_per_s / 1e6, 1),
                   "gathered_gb_per_s": round(
                       slots_per_s * bytes_per_row / 1e9, 1),
                   "edges_per_s": round(
                       adj.nnz / times["real"] / 1e6, 1),
                   "pad_overhead": round(pad_overhead, 4)}
            rows.append(row)
            print(json.dumps(row), flush=True)
    return rows


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=300_000)
    ap.add_argument("--e-total", type=int, default=6_600_000)
    ap.add_argument("--e-b", type=int, default=11776)
    ap.add_argument("--dtypes", default="float32,bfloat16,int8")
    ap.add_argument("--fs", default="64,128,256,512")
    ap.add_argument("--real", action="store_true",
                    help="measure on the bench graph's own SplitCSR index "
                    "stream instead of random indices")
    args = ap.parse_args()
    if args.real:
        bench_gather_real()
        return
    bench_stream(n=args.n)
    bench_gather(n=args.n, e_total=args.e_total, e_b=args.e_b,
                 fs=tuple(int(f) for f in args.fs.split(",")),
                 dtypes=tuple(args.dtypes.split(",")))


if __name__ == "__main__":
    main()
