"""Probe sort-free / cheaper-sort dedup formulations for bucket push
(VERDICT r3 #6). The per-hop dedup (``bucket_push._dedup_rows``) sorts
(ids, vals, thr) by id at [block, width] ~ [1024, 65536]; TODO.md records
~105ms for that 3-operand sort as the measured floor. Candidates:

  sort3     : lax.sort((i32, f32, f32), num_keys=1)     — the baseline
  sortkv    : lax.sort_key_val(ids, iota) + 2 take_along_axis gathers
  sort64    : ONE int64 key packing (id << 32 | val_bits) — valid because
              residues are non-negative floats, whose IEEE bit patterns
              are order-preserving as unsigned ints; thr rides as the one
              payload. Halves the payload traffic if 64-bit compare costs
              less than 2 payload permutes.
  sort2     : lax.sort((i32, f32), num_keys=1) + regather thr from deg —
              thr is a FUNCTION of id (rmax * deg[id]); drops the third
              operand at the cost of a [B*W] element gather.

    python -m grandtpu.bench.sort_probe [--b 1024] [--w 65536]
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
    ap.add_argument("--b", type=int, default=1024)
    ap.add_argument("--w", type=int, default=65536)
    ap.add_argument("--n", type=int, default=300_000)
    ap.add_argument("--repeats", type=int, default=5)
    args = ap.parse_args()

    import numpy as np

    import jax
    # the packed-int64-key candidate needs real int64s (without x64 JAX
    # silently truncates to int32); probe-process-only setting
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    b, w, n = args.b, args.w, args.n
    rs = np.random.RandomState(0)
    ids = jnp.asarray(rs.randint(0, n, size=(b, w)).astype(np.int32))
    vals = jnp.asarray(rs.rand(b, w).astype(np.float32))
    thr = jnp.asarray(rs.rand(b, w).astype(np.float32))
    deg = jnp.asarray(rs.randint(1, 50, size=n).astype(np.float32))
    jax.block_until_ready((ids, vals, thr, deg))

    def sync(o):
        leaves = jax.tree.leaves(o)
        jax.block_until_ready(leaves)
        return float(jnp.sum(leaves[0][:1, :1].astype(jnp.float32)))

    @jax.jit
    def sort3(ids, vals, thr):
        return jax.lax.sort((ids, vals, thr), dimension=1, num_keys=1)

    @jax.jit
    def sortkv(ids, vals, thr):
        iota = jnp.broadcast_to(
            jnp.arange(ids.shape[1], dtype=jnp.int32)[None, :], ids.shape)
        sid, perm = jax.lax.sort_key_val(ids, iota, dimension=1)
        sv = jnp.take_along_axis(vals, perm, axis=1)
        st = jnp.take_along_axis(thr, perm, axis=1)
        return sid, sv, st

    @jax.jit
    def sort64(ids, vals, thr):
        vbits = jax.lax.bitcast_convert_type(vals, jnp.int32)
        key = (ids.astype(jnp.int64) << 32) | vbits.astype(jnp.uint32
                                                           ).astype(jnp.int64)
        key_s, thr_s = jax.lax.sort((key, thr), dimension=1, num_keys=1)
        sid = (key_s >> 32).astype(jnp.int32)
        sv = jax.lax.bitcast_convert_type(
            (key_s & 0xFFFFFFFF).astype(jnp.uint32).astype(jnp.int32),
            jnp.float32)
        return sid, sv, thr_s

    @jax.jit
    def sort2(ids, vals, rmax=jnp.float32(1e-5)):
        sid, sv = jax.lax.sort((ids, vals), dimension=1, num_keys=1)
        d = deg[jnp.clip(sid, 0, n - 1)]
        st = jnp.where(d == 0, -1.0, rmax * d)
        return sid, sv, st

    fns = {"sort3": lambda: sort3(ids, vals, thr),
           "sortkv": lambda: sortkv(ids, vals, thr),
           "sort64": lambda: sort64(ids, vals, thr),
           "sort2": lambda: sort2(ids, vals)}
    results = {}
    base = None
    for name, fn in fns.items():
        out = fn()
        sync(out)
        t0 = time.time()
        for _ in range(args.repeats):
            out = fn()
        sync(out)
        dt = (time.time() - t0) / args.repeats
        results[name] = dt
        log(f"{name}: {dt*1e3:.1f} ms")
        if name == "sort3":
            base = out
        else:
            # all formulations must produce the identical id ordering and
            # payload values (vals may tie-break differently within equal
            # ids; compare id-sums which dedup actually consumes)
            import numpy as _np
            assert _np.array_equal(_np.asarray(out[0]),
                                   _np.asarray(base[0])), name
    print(json.dumps({"probe": "sort_dedup", "b": b, "w": w,
                      "ms": {k: round(v * 1e3, 2)
                             for k, v in results.items()}}), flush=True)


if __name__ == "__main__":
    main()
