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
- (VERDICT r4 #6) a vocab-sharded SPARSE (MAG) train step over the global
  mesh, asserted equal to a single-device step.
- (VERDICT r4 #6) the full sparse trainer end-to-end under world>1 with
  checkpointing + JSONL metrics: rank-0-writes semantics (one writer, no
  duplicate lines), row-padded vocab table restored through
  ``load_checkpoint``, and a ``resume=True`` rerun from latest.npz.

Run by ``tests/test_multiprocess.py``: every rank must print RANK<i> OK
and exit 0.
"""

import os
import sys

# invoked as a script from tests/, so the repo root isn't on sys.path
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    rank, world, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    shared_dir = sys.argv[4]   # shared scratch for ckpt/metrics assertions
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

    # --- (d) vocab-sharded sparse (MAG) step over the global mesh -------
    from grandtpu.config import GrandConfig
    from grandtpu.dist.data_parallel import shard_sparse_train_inputs
    from grandtpu.dist.mesh import fetch_leaf
    from grandtpu.nn.mag_mlp import init_mag_mlp
    from grandtpu.nn.sparse_input import PaddedFeatures
    from grandtpu.train.trainer_sparse import _build_sparse_steps

    rs = np.random.RandomState(3)
    vocab = 30   # deliberately not divisible by the 4-device data axis
    sfeats = sp.random(n, vocab, density=0.15, format="csr",
                       random_state=rs, dtype=np.float32)
    sfeats.data[:] = np.abs(sfeats.data) + 0.1
    padded = PaddedFeatures.from_csr(sfeats)
    scfg = GrandConfig(dataset="x", batch_size=16, unlabel_batch_size=16,
                       sample=2, dropnode_rate=0.5, lam=1.0, warmup=10.0,
                       tem=0.1, loss="l2", clip_norm=0.1, hidden=16,
                       nlayers=2, use_bn=True, input_droprate=0.0)
    smlp = MLPConfig(num_features=vocab, num_classes=2, hidden=16,
                     nlayers=2, use_bn=True)
    sopt = make_optimizer(0.01, 1e-3)
    sparams, sstate = init_mag_mlp(jax.random.PRNGKey(0), smlp)
    sopt_state = sopt.init(sparams)
    sstep, _ = _build_sparse_steps(smlp, scfg, sopt, 2)
    stk = gfpush(adj, sources, prop_mode="ppr", order=3, alpha=0.2,
                 rmax=0.0, k=4, backend="numpy")
    sbatch_np = {"rows": np.arange(32, dtype=np.int32),
                 "labels": labels.argmax(-1)[:16].astype(np.int32),
                 "label_mask": np.ones(16, np.float32)}
    skey = jax.random.PRNGKey(7)

    lp, _, _, ll = sstep(put(sparams), put(sstate), put(sopt_state),
                         put(np.asarray(padded.attr_cols)),
                         put(np.asarray(padded.attr_vals)),
                         put(stk.cols), put(stk.vals), put(sbatch_np),
                         put(skey), put(jnp.float32(0)))
    pp, ss, oo, ac, av, tc, tv = shard_sparse_train_inputs(
        mesh, params=sparams, state=sstate, opt_state=sopt_state,
        attr_cols=jnp.asarray(padded.attr_cols),
        attr_vals=jnp.asarray(padded.attr_vals),
        tk_cols=jnp.asarray(stk.cols), tk_vals=jnp.asarray(stk.vals),
        emb_mode="vocab")
    sbatch = shard_batch(mesh, {k: jnp.asarray(v)
                                for k, v in sbatch_np.items()})
    p2, _, _, l2 = sstep(pp, ss, oo, ac, av, tc, tv, sbatch, skey,
                         jnp.float32(0))
    assert abs(float(l2) - float(ll)) < 1e-4, (float(l2), float(ll))
    # the table is cross-process-sharded: fetch_leaf replicates it first
    np.testing.assert_allclose(fetch_leaf(p2["emb"]["table"])[:vocab],
                               np.asarray(lp["emb"]["table"]), atol=1e-4)

    # --- (e) sparse trainer end-to-end: world>1 ckpt + metrics ----------
    import dataclasses
    import json

    from jax.experimental import multihost_utils

    from grandtpu.train.checkpoint import load_checkpoint
    from grandtpu.train.trainer_sparse import train_sparse

    ckpt_dir = os.path.join(shared_dir, "ck")
    metrics_path = os.path.join(shared_dir, "metrics.jsonl")
    cfg_e = GrandConfig(dataset="synth:240:3:30:sparse",
                        sparse_features=True, epochs=6, patience=4,
                        order=3, alpha=0.2, rmax=1e-6, top_k=16, hidden=32,
                        nlayers=2, batch_size=32, unlabel_batch_size=32,
                        warmup=20.0, eval_batch=5, push_backend="numpy",
                        num_devices=n_global, ckpt_dir=ckpt_dir,
                        metrics_path=metrics_path, save_every=1)
    r = train_sparse(cfg_e)
    multihost_utils.sync_global_devices("ckpt-metrics-written")
    best_path = os.path.join(ckpt_dir, "best.npz")
    assert os.path.exists(best_path), "rank 0 must have written best.npz"
    assert os.path.exists(os.path.join(ckpt_dir, "latest.npz"))
    # one writer -> parseable JSONL with no duplicated eval lines
    lines = [json.loads(line) for line in open(metrics_path)]
    evals = [ln["batch"] for ln in lines if "val_acc" in ln]
    assert evals and len(evals) == len(set(evals)), \
        f"duplicate metrics lines (two writers?): {evals}"
    assert sum(1 for ln in lines if ln.get("event") == "train_end") == 1
    # restore on every rank: the vocab-padded table slices back to the true
    # vocab via the recorded row_padded meta
    mlp_e = MLPConfig(num_features=30, num_classes=3, hidden=32, nlayers=2,
                      use_bn=cfg_e.use_bn, node_norm=cfg_e.node_norm,
                      input_droprate=cfg_e.input_droprate,
                      hidden_droprate=cfg_e.hidden_droprate)
    pt, st = init_mag_mlp(jax.random.PRNGKey(0), mlp_e)
    bp, _, _, meta = load_checkpoint(best_path, params_template=pt,
                                     state_template=st)
    assert np.asarray(bp["emb"]["table"]).shape[0] == 30
    np.testing.assert_allclose(np.asarray(bp["emb"]["table"]),
                               np.asarray(r.params["emb"]["table"])[:30],
                               atol=1e-5)
    assert abs(float(meta["best_val_acc"]) - r.best_val_acc) < 1e-6
    # resume from latest.npz under world>1 (every rank reads, loop continues)
    cfg_r = dataclasses.replace(cfg_e, resume=True, epochs=2)
    r2 = train_sparse(cfg_r)
    assert r2.num_batches >= r.num_batches, (r2.num_batches, r.num_batches)
    multihost_utils.sync_global_devices("resume-done")

    print(f"RANK{rank} OK", flush=True)


if __name__ == "__main__":
    main()
