"""Worker for the true multi-process distributed test (VERDICT r3 #2).

Each rank is a REAL separate process joined through
``jax.distributed.initialize`` (CPU backend, 2 local devices per process),
so the cross-process code paths run for real rather than being emulated by
in-process loops:

- ``multihost_native_gfpush``'s world>1 branch (``dist/push.py``):
  per-rank native push + ``process_allgather`` assembly over the
  distributed backend — asserted EXACTLY equal to a local full push.
- a GSPMD train step jitted over the GLOBAL mesh (all ranks' devices),
  asserted equal (1e-4) to a single-device step on identical inputs.
- ``dist_exact_propagate`` down BOTH exchange branches on the global mesh,
  asserted against the local single-device ``exact_propagate``.

Run by ``tests/test_multiprocess.py``: every rank must print RANK<i> OK
and exit 0.
"""

import os
import sys

# invoked as a script from tests/, so the repo root isn't on sys.path
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    rank, world, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=2")
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=world, process_id=rank)
    assert jax.process_count() == world, jax.process_count()
    n_global = len(jax.devices())
    assert n_global == 2 * world, jax.devices()

    import numpy as np
    import scipy.sparse as sp

    import jax.numpy as jnp

    from grandtpu.data import synthetic_graph
    from grandtpu.dist import dist_exact_propagate, make_mesh
    from grandtpu.dist.push import multihost_native_gfpush
    from grandtpu.ppr import gfpush

    n = 96
    adj, feats, labels = synthetic_graph(num_nodes=n, num_classes=2,
                                         num_features=16, seed=0)
    adj = (adj + sp.eye(n, format="csr")).tocsr()
    sources = np.arange(n)

    # --- (a) multi-process native push: the process_allgather branch ---
    kw = dict(prop_mode="ppr", order=3, alpha=0.2, rmax=1e-4, k=4)
    tk_dist = multihost_native_gfpush(adj, sources, backend="native", **kw)
    tk_local = gfpush(adj, sources, backend="native", **kw)
    assert np.array_equal(tk_dist.cols, tk_local.cols), "push cols diverge"
    assert np.array_equal(tk_dist.vals, tk_local.vals), "push vals diverge"

    # --- (b) GSPMD train step over the GLOBAL mesh vs single-device ---
    from grandtpu.dist.data_parallel import shard_batch, shard_train_inputs
    from grandtpu.nn.mlp import MLPConfig, init_mlp
    from grandtpu.train.step import (StepConfig, build_train_step,
                                     make_optimizer)

    mesh = make_mesh(n_data=n_global, n_model=1)
    mlp_cfg = MLPConfig(num_features=16, num_classes=2, hidden=8,
                        nlayers=2, use_bn=True)
    n_train = n_unlabel = n_global
    step_cfg = StepConfig(mlp=mlp_cfg, k_aug=2, dropnode_rate=0.5,
                          n_train=n_train, lam=1.0, warmup=10.0, tem=0.1,
                          conf=1.0, loss_kind="l2", clip_norm=0.1)
    optimizer = make_optimizer(0.01, 1e-3)
    params, state = init_mlp(jax.random.PRNGKey(0), mlp_cfg)
    opt_state = optimizer.init(params)
    step = build_train_step(step_cfg, optimizer)

    tk = gfpush(adj, sources, prop_mode="ppr", order=3, alpha=0.2,
                rmax=0.0, k=4, backend="numpy")
    batch_np = {
        "rows": np.arange(n_train + n_unlabel, dtype=np.int32),
        "labels": labels.argmax(-1)[:n_train].astype(np.int32),
        "label_mask": np.ones(n_train, np.float32),
    }
    key, step_idx = jax.random.PRNGKey(3), jnp.float32(0)

    pp, ss, oo, ff, tc, tv = shard_train_inputs(
        mesh, params=params, state=state, opt_state=opt_state,
        features=jnp.asarray(feats), tk_cols=jnp.asarray(tk.cols),
        tk_vals=jnp.asarray(tk.vals), tensor_parallel=False)
    batch = shard_batch(mesh, {k: jnp.asarray(v)
                               for k, v in batch_np.items()})
    p2, s2, o2, metrics = step(pp, ss, oo, ff, tc, tv, batch, key, step_idx)
    dist_loss = float(metrics["loss"])     # replicated -> addressable

    # identical step on this rank's first local device, no mesh
    local_dev = jax.local_devices()[0]
    put = lambda t: jax.tree.map(                          # noqa: E731
        lambda x: jax.device_put(jnp.asarray(x), local_dev), t)
    lp, ls, lo, lm = step(put(params), put(state), put(opt_state),
                          put(feats), put(tk.cols), put(tk.vals),
                          put(batch_np), put(key), put(step_idx))
    local_loss = float(lm["loss"])
    assert abs(dist_loss - local_loss) < 1e-4, (dist_loss, local_loss)
    for a, b in zip(jax.tree.leaves(p2), jax.tree.leaves(lp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)

    # --- (c) sharded predict-time propagation, both exchange branches ---
    from grandtpu.infer import exact_propagate

    ref = np.asarray(exact_propagate(adj, feats, mode="ppr", order=3,
                                     alpha=0.2))
    for thr in (0.0, float("inf")):        # all_gather / halo
        out = dist_exact_propagate(mesh, adj, feats, mode="ppr", order=3,
                                   alpha=0.2, halo_threshold=thr)
        np.testing.assert_allclose(out, ref, atol=1e-4,
                                   err_msg=f"halo_threshold={thr}")

    print(f"RANK{rank} OK", flush=True)


if __name__ == "__main__":
    main()
