"""Training-step latency/throughput on device.

Measures the pure jitted GRAND+ step (K augmentations + loss + Adam) with
all operands device-resident, back-to-back (the dispatch of step t+1
overlaps the device execution of step t, so per-step cost approaches the
device time, not the tunnel round trip).

    python -m grandtpu.bench.train_step
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


CONFIGS = {
    # name: (n_nodes, n_feat, classes, hidden, nlayers, batch, unlabel, ktop)
    "cora-like": (2708, 1433, 7, 64, 2, 50, 100, 32),
    "reddit-like": (233_000, 602, 41, 512, 2, 50, 200, 64),
    "amazon2m-like": (2_000_000, 100, 47, 1024, 2, 50, 200, 64),
}


def bench_train_step(name: str, steps: int = 50):
    import jax
    import jax.numpy as jnp

    from grandtpu.nn.mlp import MLPConfig, init_mlp
    from grandtpu.train.step import (StepConfig, build_train_step,
                                     make_optimizer)

    n, f, c, h, nl, bs, ub, ktop = CONFIGS[name]
    rs = np.random.RandomState(0)
    features = jnp.asarray(rs.rand(n, f).astype(np.float32))
    n_src = bs * 4 + ub * 4
    tk_cols = jnp.asarray(rs.randint(0, n, (n_src, ktop)).astype(np.int32))
    tk_vals = jnp.asarray(rs.rand(n_src, ktop).astype(np.float32))

    mlp_cfg = MLPConfig(num_features=f, num_classes=c, hidden=h, nlayers=nl,
                        use_bn=True, input_droprate=0.2, hidden_droprate=0.2)
    step_cfg = StepConfig(mlp=mlp_cfg, k_aug=2, dropnode_rate=0.5,
                          n_train=bs, lam=1.0, warmup=100.0, tem=0.1,
                          conf=2.0 / c, loss_kind="l2", clip_norm=-1.0)
    optimizer = make_optimizer(1e-3, 1e-4)
    params, state = init_mlp(jax.random.PRNGKey(0), mlp_cfg)
    opt_state = optimizer.init(params)
    step = build_train_step(step_cfg, optimizer)

    batch = {
        "rows": jnp.asarray(rs.randint(0, n_src, bs + ub).astype(np.int32)),
        "labels": jnp.asarray(rs.randint(0, c, bs).astype(np.int32)),
        "label_mask": jnp.ones(bs, jnp.float32),
    }
    key = jax.random.PRNGKey(1)
    # warm
    params, state, opt_state, m = step(params, state, opt_state, features,
                                       tk_cols, tk_vals, batch, key,
                                       jnp.float32(0))
    # scalar fetch, not block_until_ready: the latter can return early
    # through the axon tunnel (see RESULTS.md timing note)
    float(np.asarray(m["loss"]))
    t0 = time.time()
    for i in range(steps):
        params, state, opt_state, m = step(
            params, state, opt_state, features, tk_cols, tk_vals, batch,
            key, jnp.float32(i))
    float(np.asarray(m["loss"]))    # steps chain on params: syncs them all
    dt = (time.time() - t0) / steps
    edges = (bs + ub) * ktop * step_cfg.k_aug
    out = {"metric": f"train_step_{name}", "value": 1.0 / dt,
           "unit": "steps/s", "step_ms": dt * 1000,
           "aggregated_edges_per_s": edges / dt}
    print(json.dumps(out), flush=True)
    return out


def bench_sparse_train_step(steps: int = 50, n=200_000, vocab=100_000,
                            h=64, c=8, bs=20, ub=20, ktop=32, p_nnz=24):
    """MAG-like sparse-feature engine step (embedding weighted-mean inside
    the K loop, vmapped since r3)."""
    import jax
    import jax.numpy as jnp

    from grandtpu.config import GrandConfig
    from grandtpu.nn.mag_mlp import init_mag_mlp
    from grandtpu.nn.mlp import MLPConfig
    from grandtpu.train.step import make_optimizer
    from grandtpu.train.trainer_sparse import _build_sparse_steps

    rs = np.random.RandomState(0)
    n_src = (bs + ub) * 4
    attr_cols = jnp.asarray(rs.randint(0, vocab, (n, p_nnz)).astype(
        np.int32))
    attr_vals = jnp.asarray(rs.rand(n, p_nnz).astype(np.float32))
    tk_cols = jnp.asarray(rs.randint(0, n, (n_src, ktop)).astype(np.int32))
    tk_vals = jnp.asarray(rs.rand(n_src, ktop).astype(np.float32))

    gcfg = GrandConfig(dataset="bench", batch_size=bs,
                       unlabel_batch_size=ub, sample=2, dropnode_rate=0.5,
                       lam=1.0, warmup=100.0, tem=0.1, loss="l2",
                       clip_norm=-1.0, hidden=h, nlayers=2, use_bn=True,
                       input_droprate=0.1)
    mlp_cfg = MLPConfig(num_features=vocab, num_classes=c, hidden=h,
                        nlayers=2, use_bn=True)
    params, state = init_mag_mlp(jax.random.PRNGKey(0), mlp_cfg)
    optimizer = make_optimizer(1e-3, 1e-4)
    opt_state = optimizer.init(params)
    step, _ = _build_sparse_steps(mlp_cfg, gcfg, optimizer, c)

    batch = {
        "rows": jnp.asarray(rs.randint(0, n_src, bs + ub).astype(np.int32)),
        "labels": jnp.asarray(rs.randint(0, c, bs).astype(np.int32)),
        "label_mask": jnp.ones(bs, jnp.float32),
    }
    key = jax.random.PRNGKey(1)
    params, state, opt_state, loss = step(
        params, state, opt_state, attr_cols, attr_vals, tk_cols, tk_vals,
        batch, key, jnp.float32(0))
    float(np.asarray(loss))
    t0 = time.time()
    for i in range(steps):
        params, state, opt_state, loss = step(
            params, state, opt_state, attr_cols, attr_vals, tk_cols,
            tk_vals, batch, key, jnp.float32(i))
    float(np.asarray(loss))
    dt = (time.time() - t0) / steps
    out = {"metric": "train_step_mag-like-sparse", "value": 1.0 / dt,
           "unit": "steps/s", "step_ms": dt * 1000}
    print(json.dumps(out), flush=True)
    return out


if __name__ == "__main__":
    for name in CONFIGS:
        bench_train_step(name)
    bench_sparse_train_step()
