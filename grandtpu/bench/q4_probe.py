"""Adjudicate int4-packed feature gather on hardware (round 4 probe).

The roofline study (RESULTS.md) settled that the block SpMM is per-ROW
gather-engine bound and already within 7% of its perfect-locality variant
— the one untried lever on the headline is narrower rows. int8 (128-byte
rows at F=128) bought 2x over f32; this probe measures 64-byte rows:
per-column symmetric int4, two columns packed per byte, sign-extended
nibble unpack on the gathered [E_b, F/2] block (cheap VPU shifts), then
the same exact int8 x int8 -> int32 MXU one-hot matmul as
``spmm_split_q8mxu`` (int4 values are a subset of int8 — no new matmul).

Expected failure mode, stated up front: int4 has 15 levels, so per-element
quantization error is ~1/14 of each column's max (vs 1/254 for int8) and
the order-5 loop re-quantizes every hop. The accuracy gate for fast paths
is rel err < 5e-3 (bench.py protocol); if int4 busts it, the probe's other
question still gets answered — do 64B rows gather materially faster than
128B, i.e. is there any throughput left below int8? Keep only if BOTH
gates pass (the Pallas-DropNode / q8mxu adjudication policy).

    python -m grandtpu.bench.q4_probe [--n 300000] [--deg 30]
"""

from __future__ import annotations

import argparse
import functools
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
    ap.add_argument("--alpha", type=float, default=0.2)
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--rs", default="224,288,320",
                    help="rows_per_block values to sweep")
    args = ap.parse_args()
    if args.f % 2 != 0:
        ap.error(f"--f must be even (got {args.f}): the int4 pack pairs "
                 f"column j with column j+F/2 into one byte")

    import numpy as np
    import scipy.sparse as sp

    import jax
    import jax.numpy as jnp

    from grandtpu.bench.driver import bench_host_scipy, build_graph
    from grandtpu.sparse.spmm import (SplitCSR, row_values_if_constant,
                                      spmm_split_q8mxu)

    adj, feats = build_graph(n=args.n, avg_degree=args.deg, f=args.f)
    _, host_out = bench_host_scipy(adj, feats, order=args.order)
    scale_ref = max(np.max(np.abs(host_out)), 1e-9)

    deg = np.asarray(adj.sum(1)).flatten()
    a_norm = sp.diags(1.0 / np.maximum(deg, 1e-12)).dot(adj).tocsr()
    rv = row_values_if_constant(a_norm)
    assert rv is not None

    # --- int4 kernels (probe-local; productized only if they win) -------

    def quantize_columns_int4(x):
        amax = jnp.max(jnp.abs(x), axis=0)
        scale = jnp.where(amax > 0, amax / 7.0, 1.0).astype(jnp.float32)
        q = jnp.clip(jnp.round(x / scale[None, :]), -7, 7).astype(jnp.int8)
        f = x.shape[1]
        # byte j holds (col j, col j+F/2): low nibble two's-complement of
        # col j, high nibble col j+F/2 — unpack is two shifts + one concat
        lo = jnp.bitwise_and(q[:, : f // 2], jnp.int8(0x0F))
        hi = jnp.left_shift(q[:, f // 2:], 4)
        return jnp.bitwise_or(hi, lo), scale

    def _block_step_q4mxu(packed, iota, c, lr):
        p = jnp.take(packed, c, axis=0)                  # int8 [E_b, F/2]
        lo = jnp.right_shift(jnp.left_shift(p, 4), 4)    # sign-extend
        hi = jnp.right_shift(p, 4)                       # arithmetic shift
        feats = jnp.concatenate([lo, hi], axis=1)        # int8 [E_b, F]
        onehot = (lr[None, :] == iota).astype(jnp.int8)
        return jax.lax.dot_general(
            onehot, feats, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)

    def q4_base(bcsr, packed, scale, row_val):
        r = bcsr.rows_per_block
        f = 2 * packed.shape[1]
        iota = jnp.arange(r, dtype=jnp.int32)[:, None]

        def step(_, blk):
            c, lr = blk
            return None, _block_step_q4mxu(packed, iota, c, lr)

        _, outs = jax.lax.scan(step, None, (bcsr.cols, bcsr.lrow),
                               unroll=min(4, bcsr.num_blocks))
        out = outs.reshape(-1, f).astype(jnp.float32)
        return out * row_val[:, None] * scale[None, :]

    def q4_offset(ob, packed, scale, row_val, acc):
        r = ob.rows_per_block
        f = 2 * packed.shape[1]
        iota = jnp.arange(r, dtype=jnp.int32)[:, None]

        def step(acc, blk):
            c, lr, r0 = blk
            out = _block_step_q4mxu(packed, iota, c, lr).astype(jnp.float32)
            rvs = jax.lax.dynamic_slice(row_val, (r0,), (r,))
            out = out * rvs[:, None] * scale[None, :]
            slab = jax.lax.dynamic_slice(acc, (r0, 0), (r, f))
            acc = jax.lax.dynamic_update_slice(acc, slab + out, (r0, 0))
            return acc, None

        acc, _ = jax.lax.scan(step, acc, (ob.cols, ob.lrow, ob.row0),
                              unroll=min(2, ob.row0.shape[0]))
        return acc

    @functools.partial(jax.jit, static_argnames=("order", "variant"))
    def run_ppr(split, x, row_val, order, alpha, variant):
        n = x.shape[0]
        n_pad = split.num_blocks * split.rows_per_block
        x = jnp.pad(x, ((0, n_pad - n), (0, 0)))

        def apply_p(v):
            if variant == "int4":
                packed, scale = quantize_columns_int4(v)
                out = q4_base(split.base, packed, scale, row_val)
                for lvl in split.levels:
                    out = q4_offset(lvl, packed, scale, row_val, out)
                return out
            return spmm_split_q8mxu(split, v, row_val, trim=False)

        x0 = alpha * x

        def body(_, carry):
            cur, acc = carry
            cur = (1.0 - alpha) * apply_p(cur)
            return cur, acc + cur

        _, out = jax.lax.fori_loop(0, order, body, (x0, x0))
        return out[:n]

    x = jnp.asarray(feats)
    jax.block_until_ready(x)

    def sync(o):
        jax.block_until_ready(o)
        return float(jnp.sum(o[:1, :1]))

    results = []
    for r in (int(s) for s in args.rs.split(",")):
        split = SplitCSR.from_scipy(a_norm, rows_per_block=r)
        n_pad = split.num_blocks * split.rows_per_block
        row_val = jnp.asarray(np.pad(rv, (0, n_pad - args.n)))
        for variant in ("int8mxu", "int4"):
            t0 = time.time()
            out = run_ppr(split, x, row_val, args.order, args.alpha, variant)
            sync(out)
            compile_s = time.time() - t0
            t0 = time.time()
            for _ in range(args.repeats):
                out = run_ppr(split, x, row_val, args.order, args.alpha,
                              variant)
            sync(out)
            per_call = (time.time() - t0) / args.repeats
            eps = adj.nnz * args.order / per_call
            err = float(np.max(np.abs(np.asarray(out) - host_out))
                        / scale_ref)
            row = {"variant": variant, "rows_per_block": r,
                   "edges_per_s": eps, "rel_err": err,
                   "compile_s": round(compile_s, 1)}
            results.append(row)
            log(json.dumps(row))
    print(json.dumps({"probe": "q4", "n": args.n, "deg": args.deg,
                      "f": args.f, "order": args.order,
                      "results": results}), flush=True)


if __name__ == "__main__":
    main()
