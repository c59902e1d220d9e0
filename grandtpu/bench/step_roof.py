"""%-of-component-roof for the train step and the bucket push (VERDICT r4
#8): every headline number gets a denominator, not just the SpMM.

The SpMM kernels already publish %-of-SOL against their perfect-locality
variants (RESULTS.md roofline table). This probe does the analogous
reconciliation for the other two headline numbers:

- **train step** (``bench/train_step.py`` shapes): time the full jitted
  step, then its two data/compute components in isolation at identical
  shapes — (a) the batch data movement (top-k row gathers + feature
  gather + the K DropNode weighted-mean reductions) and (b) the MLP
  forward+backward (K augmented forwards, value_and_grad). The component
  sum is the no-overhead serial roof; pct_of_roof = (a+b)/step.
- **bucket push** (``bench/push.py`` shape): run one planned+replayed
  block to capture the per-hop shape plan, then time the plan's isolated
  primitives — the two 3-operand ``lax.sort`` calls per hop, the per-hop
  record + packed-edge gathers, and the finalize dedup sort + top_k —
  at exactly the planned shapes. pct_of_floor = sum(components)/block.

Run on the real chip (one process at a time — see CLAUDE.md):

    python -m grandtpu.bench.step_roof [--steps 50] [--skip-push]
                                       [--configs cora-like,...]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _timer(fn, sync, repeats):
    sync(fn())      # warm/compile, synced before the clock starts
    t0 = time.time()
    for _ in range(repeats):
        out = fn()
    sync(out)
    return (time.time() - t0) / repeats


def train_step_roof(name: str, steps: int = 50):
    import jax
    import jax.numpy as jnp

    from grandtpu.bench.train_step import CONFIGS, bench_train_step
    from grandtpu.nn.dropnode import random_prop
    from grandtpu.nn.mlp import MLPConfig, apply_mlp, init_mlp

    n, f, c, h, nl, bs, ub, ktop = CONFIGS[name]
    k_aug = 2
    full = bench_train_step(name, steps=steps)
    step_ms = full["step_ms"]

    rs = np.random.RandomState(0)
    features = jnp.asarray(rs.rand(n, f).astype(np.float32))
    n_src = bs * 4 + ub * 4
    tk_cols = jnp.asarray(rs.randint(0, n, (n_src, ktop)).astype(np.int32))
    tk_vals = jnp.asarray(rs.rand(n_src, ktop).astype(np.float32))
    rows = jnp.asarray(rs.randint(0, n_src, bs + ub).astype(np.int32))
    mlp_cfg = MLPConfig(num_features=f, num_classes=c, hidden=h, nlayers=nl,
                        use_bn=True, input_droprate=0.2, hidden_droprate=0.2)
    params, state = init_mlp(jax.random.PRNGKey(0), mlp_cfg)
    key = jax.random.PRNGKey(1)

    # (a) data movement: the step's exact gather + K DropNode reductions
    @jax.jit
    def data_component(features, tk_cols, tk_vals, rows, key):
        cols = jnp.take(tk_cols, rows, axis=0)
        vals = jnp.take(tk_vals, rows, axis=0)
        feats = jnp.take(features, cols, axis=0)         # [B, Ktop, F]
        keys = jax.random.split(key, k_aug)
        xs = jax.vmap(lambda kk: random_prop(
            feats, vals, key=kk, dropnode_rate=0.5, training=True))(keys)
        return xs.sum()    # consume so nothing is DCE'd

    # (b) compute: K augmented MLP forwards + backward at the step's shape
    x_aug = jnp.asarray(rs.rand(k_aug, bs + ub, f).astype(np.float32))

    def fwd(params):
        keys = jax.random.split(key, k_aug)

        def one(xk, kk):
            logits, _ = apply_mlp(params, state, mlp_cfg, xk, key=kk,
                                  training=True)
            return jax.nn.log_softmax(logits, axis=-1)

        logps = jax.vmap(one)(x_aug, keys)
        return logps.sum()

    mlp_component = jax.jit(jax.value_and_grad(fwd))

    def sync(o):
        leaf = jax.tree.leaves(o)[0]
        float(np.asarray(jnp.sum(jnp.ravel(leaf)[:1])))

    t_data = _timer(lambda: data_component(features, tk_cols, tk_vals,
                                           rows, key), sync, steps) * 1000
    t_mlp = _timer(lambda: mlp_component(params), sync, steps) * 1000
    roof = t_data + t_mlp
    row = {"metric": f"train_step_roof_{name}", "step_ms": step_ms,
           "data_ms": round(t_data, 4), "mlp_fwdbwd_ms": round(t_mlp, 4),
           "component_roof_ms": round(roof, 4),
           "pct_of_roof": round(100.0 * roof / step_ms, 1)}
    print(json.dumps(row), flush=True)
    return row


def push_roof(n=300_000, n_src=1024, order=10, alpha=0.2, rmax=1e-5,
              k=64, block=1024, window=8, repeats=3):
    import jax
    import jax.numpy as jnp

    from grandtpu.bench.push import build
    from grandtpu.ppr import build_coef
    from grandtpu.ppr.bucket_push import (BucketPushGraph, _bucket,
                                          gfpush_bucketed)

    adj = build(n=n)
    indptr = adj.indptr.astype(np.int32)
    indices = adj.indices.astype(np.int32)
    sources = np.arange(n_src, dtype=np.int32) * (n // n_src)
    coef = build_coef("ppr", order, alpha)
    g = BucketPushGraph(indptr, indices, rmax, window=window)

    run = lambda: gfpush_bucketed(indptr, indices, sources, coef, rmax, k,
                                  block=block, window=window, graph=g)
    t0 = time.time()
    run()   # plan + compile
    log(f"push first call (plan+compile): {time.time() - t0:.1f}s")
    times = []
    for _ in range(repeats):
        t0 = time.time()
        run()
        times.append(time.time() - t0)
    n_blocks = -(-n_src // block)
    block_ms = min(times) / n_blocks * 1000
    plan = g.plan_for(np.asarray(coef, np.float32), block)
    assert plan.caps is not None, "planning must have populated the plan"
    log(f"block: {block_ms:.1f}ms over {n_blocks} block(s); "
        f"plan caps: {plan.caps}")

    rs = np.random.RandomState(0)
    w = window
    m_blk = int(np.asarray(g.packed2d.shape[0]))

    def sync(o):
        leaf = jax.tree.leaves(o)[0]
        float(np.asarray(jnp.sum(jnp.ravel(leaf)[:1].astype(jnp.float32))))

    sort3 = jax.jit(lambda i, v, t: jax.lax.sort((i, v, t), dimension=1,
                                                 num_keys=1))
    sort_ms = gather_ms = 0.0
    log_width = 1
    for cap in plan.caps:
        if cap is None:
            break
        p_cap, e_w, c_out = cap
        width = e_w * w
        ids = jnp.asarray(rs.randint(0, n, (block, width)).astype(np.int32))
        vals = jnp.asarray(rs.rand(block, width).astype(np.float32))
        thr = jnp.asarray(rs.rand(block, width).astype(np.float32))
        # two 3-operand sorts per hop: _dedup_rows + emit-first compaction
        t = _timer(lambda: sort3(ids, vals, thr), sync, repeats)
        sort_ms += 2 * t * 1000
        # per-hop gathers: the [B*p_cap, 8] record gather to B*e_w rows and
        # the [m_blk, 2w] packed edge+threshold gather to B*e_w rows
        rec = jnp.asarray(rs.randint(0, 2 ** 30,
                                     (block * p_cap, 8)).astype(np.int32))
        eid = jnp.asarray(rs.randint(0, block * p_cap,
                                     block * e_w).astype(np.int32))
        blk_c = jnp.asarray(rs.randint(0, m_blk,
                                       block * e_w).astype(np.int32))
        # large operands travel as jit ARGUMENTS, not closure constants —
        # closure capture bakes them into the jaxpr and blows up the
        # serialized remote-compile payload (see train/loop.py note)
        take = jax.jit(lambda t, i: jnp.take(t, i, axis=0))
        gather_ms += _timer(lambda: take(rec, eid), sync, repeats) * 1000
        gather_ms += _timer(lambda: take(g.packed2d, blk_c), sync,
                            repeats) * 1000
        log_width += c_out
    wb = _bucket(max(log_width, k), lo=max(128, k))
    fin_ids = jnp.asarray(rs.randint(0, n, (block, wb)).astype(np.int32))
    fin_vals = jnp.asarray(rs.rand(block, wb).astype(np.float32))
    sort2 = jax.jit(lambda i, v: jax.lax.sort((i, v), dimension=1,
                                              num_keys=1))
    topk = jax.jit(lambda v: jax.lax.top_k(v, k))
    fin_sort_ms = _timer(lambda: sort2(fin_ids, fin_vals), sync,
                         repeats) * 1000
    fin_topk_ms = _timer(lambda: topk(fin_vals), sync, repeats) * 1000

    floor = sort_ms + gather_ms + fin_sort_ms + fin_topk_ms
    row = {"metric": "bucket_push_roof", "block_ms": round(block_ms, 1),
           "hop_sorts_ms": round(sort_ms, 1),
           "hop_gathers_ms": round(gather_ms, 1),
           "finalize_sort_ms": round(fin_sort_ms, 1),
           "finalize_topk_ms": round(fin_topk_ms, 1),
           "component_floor_ms": round(floor, 1),
           "pct_of_floor": round(100.0 * floor / block_ms, 1),
           "sources_per_s": round(n_src / (min(times))),
           "hops_planned": sum(1 for cap in plan.caps if cap is not None)}
    print(json.dumps(row), flush=True)
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--configs", default="cora-like,reddit-like,"
                                         "amazon2m-like")
    ap.add_argument("--skip-push", action="store_true")
    ap.add_argument("--skip-step", action="store_true")
    args = ap.parse_args()
    if not args.skip_step:
        for name in args.configs.split(","):
            train_step_roof(name, steps=args.steps)
    if not args.skip_push:
        push_roof()


if __name__ == "__main__":
    main()
