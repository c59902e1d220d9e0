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
                      dtypes=("float32", "int8"), repeats=3):
    """Gather roof on the REAL index stream the production SpMM issues
    (VERDICT r3 #3: the random-index roof under-measured — the headline
    implied more gathered rows/s than the 'roof'). Builds the bench graph,
    takes the SplitCSR base level's cols at the production block sizes,
    and runs the identical gather+cheap-reduce scan over them. The
    denominator for %-of-roof: SpMM slots/s = edges/s * pad_overhead."""
    import jax
    import jax.numpy as jnp

    from grandtpu.bench.driver import build_graph
    from grandtpu.infer import Propagator

    adj, _ = build_graph(f=4)
    rows = []
    for r in rs:
        prop = Propagator(adj, backend="block", rows_per_block=r)
        base = prop.adj_op.base
        idx = base.cols                        # [nb, E_b], device
        n = base.num_nodes
        pad_overhead = prop.adj_op.pad_overhead
        log(f"R={r}: blocks={base.cols.shape} pad_overhead="
            f"{pad_overhead:.3f} levels={len(prop.adj_op.levels)}")

        def run(x, idx):
            def step(acc, ic):
                slab = jnp.take(x, ic, axis=0)
                return acc + jnp.sum(slab.astype(jnp.float32), axis=0), None

            acc0 = jnp.zeros((x.shape[1],), jnp.float32)
            acc, _ = jax.lax.scan(step, acc0, idx, unroll=4)
            return acc

        runj = jax.jit(run)
        for dt in dtypes:
            x = jax.jit(lambda dt=dt: jax.random.uniform(
                jax.random.PRNGKey(0), (n, f)).astype(dt))()
            jax.block_until_ready(x)
            _sync(runj(x, idx))
            times = []
            for _ in range(repeats):
                t0 = time.time()
                out = runj(x, idx)
                _sync(out)
                times.append(time.time() - t0)
            rps = idx.size / min(times)
            row = {"metric": "gather_rows_per_s_real_stream", "value": rps,
                   "f": f, "dtype": dt, "rows_per_block": r,
                   "e_b": int(idx.shape[1]),
                   "pad_overhead": round(float(pad_overhead), 4),
                   "nnz": int(adj.nnz)}
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
        bench_gather_real(dtypes=tuple(args.dtypes.split(",")))
        return
    bench_stream(n=args.n)
    bench_gather(n=args.n, e_total=args.e_total, e_b=args.e_b,
                 fs=tuple(int(f) for f in args.fs.split(",")),
                 dtypes=tuple(args.dtypes.split(",")))


if __name__ == "__main__":
    main()
