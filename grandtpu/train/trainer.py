"""Host-side experiment driver: the L3 engine (dense-feature path).

Reproduces reference ``main`` (``model.py:227-373``) around the jitted step:

  load -> self-loops -> unlabeled pool -> GFPush top-k -> device-resident
  (features, top-k table) -> shared training loop (``loop.py``) -> exact
  full-graph propagation test with the best weights.

All shapes entering jit are static: partial train batches are padded with
duplicated rows and masked out of the loss, BN batch statistics, and the
consistency loss (mask-weighted BN in ``nn/mlp.py``), so every step is
numerically identical to the reference feeding the true smaller batch.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from grandtpu.config import GrandConfig
from grandtpu.data import GraphData, load_data
from grandtpu.data.preprocess import add_self_loops_adj
from grandtpu.infer import exact_propagate, test_accuracy
from grandtpu.nn.mlp import MLPConfig, init_mlp
from grandtpu.observe import profile_trace
from grandtpu.ppr import gfpush
from grandtpu.train.loop import pad_batch, run_training_loop
from grandtpu.train.step import (StepConfig, build_eval_step,
                                 build_train_step, make_optimizer)

# kept importable from here for backward compatibility
_pad_batch = pad_batch


@dataclasses.dataclass
class TrainResult:
    test_acc: float
    best_val_acc: float
    best_val_loss: float
    num_batches: int
    total_time: float
    batch_time_avg: float
    batch_time_median: float   # tunnel-robust signal: the axon tunnel adds
    # many-x run-to-run variance to means (RESULTS.md scale-run caveat);
    # the median ignores stall outliers so rounds stay comparable
    preprocess_time: float
    params: object = None
    state: object = None
    history: list = dataclasses.field(default_factory=list)


def train(cfg: GrandConfig, data: Optional[GraphData] = None,
          log=None) -> TrainResult:
    """Run one full GRAND+ training + exact-propagation test."""
    verbose = log if log is not None else (print if cfg.visible else
                                           (lambda *a, **k: None))
    rng = np.random.RandomState(cfg.seed2)
    if data is None:
        data = load_data(cfg.dataset, split_seed=cfg.seed1)
    if data.has_sparse_features:
        # dispatch like the reference driver does on dataset name
        # (run_model.py:87-90), but on the actual feature format
        from grandtpu.train.trainer_sparse import train_sparse
        return train_sparse(cfg, data=data, log=log)

    t_start = time.time()
    adj_sl = add_self_loops_adj(data.adj)

    # unlabeled pool, reference model.py:244-248 (including the [:-1] slice
    # quirk when unlabel_num == -1)
    idx_sample = rng.permutation(data.idx_test)[: cfg.unlabel_num]
    idx_unlabel = np.concatenate([data.idx_val, idx_sample])
    sources = np.concatenate([data.idx_train, idx_unlabel])

    if cfg.push_cache_dir:
        from grandtpu.ppr import cached_gfpush
        tk = cached_gfpush(cfg.push_cache_dir, adj_sl, sources,
                           prop_mode=cfg.prop_mode, order=cfg.order,
                           alpha=cfg.alpha, rmax=cfg.rmax, k=cfg.top_k,
                           backend=cfg.push_backend)
    else:
        tk = gfpush(adj_sl, sources, prop_mode=cfg.prop_mode,
                    order=cfg.order, alpha=cfg.alpha, rmax=cfg.rmax,
                    k=cfg.top_k, backend=cfg.push_backend)
    preprocess_time = time.time() - t_start
    verbose(f"preprocessing done, time: {preprocess_time:.3f}s")

    # device-resident tensors
    features = jnp.asarray(np.asarray(data.features), jnp.float32)
    tk_cols = jnp.asarray(tk.cols)
    tk_vals = jnp.asarray(tk.vals)
    labels_int = data.labels_int

    n_class = data.num_classes
    mlp_cfg = MLPConfig(
        num_features=data.num_features, num_classes=n_class,
        hidden=cfg.hidden, nlayers=cfg.nlayers, use_bn=cfg.use_bn,
        node_norm=cfg.node_norm, input_droprate=cfg.input_droprate,
        hidden_droprate=cfg.hidden_droprate)
    step_cfg = StepConfig(
        mlp=mlp_cfg, k_aug=cfg.sample, dropnode_rate=cfg.dropnode_rate,
        n_train=cfg.batch_size, lam=cfg.lam, warmup=cfg.warmup, tem=cfg.tem,
        conf=cfg.resolve_conf(n_class), loss_kind=cfg.loss,
        clip_norm=cfg.clip_norm)

    key = jax.random.PRNGKey(cfg.seed2)
    key, init_key = jax.random.split(key)
    params, state = init_mlp(init_key, mlp_cfg)
    optimizer = make_optimizer(cfg.lr, cfg.weight_decay)
    opt_state = optimizer.init(params)
    train_step = build_train_step(step_cfg, optimizer)
    eval_step = build_eval_step(step_cfg)

    # multi-device placement: GSPMD shardings seed the whole step (dp over
    # batch rows + row-sharded tables); XLA inserts the collectives
    mesh = None
    if cfg.num_devices > 1:
        if len(jax.devices()) < cfg.num_devices:
            raise RuntimeError(
                f"num_devices={cfg.num_devices} but only "
                f"{len(jax.devices())} devices visible")
        from grandtpu.dist import make_mesh
        from grandtpu.dist.data_parallel import shard_train_inputs
        mesh = make_mesh(n_data=cfg.num_devices, n_model=1)
        (params, state, opt_state, features, tk_cols,
         tk_vals) = shard_train_inputs(
            mesh, params=params, state=state, opt_state=opt_state,
            features=features, tk_cols=tk_cols, tk_vals=tk_vals)

    # validation rows: whole val set in one eval call (BN is in eval mode,
    # so reference's batching of valid() has no numeric effect)
    val_rows = jnp.asarray(tk.row_positions(data.idx_val))
    val_labels = jnp.asarray(labels_int[data.idx_val])
    val_mask = jnp.ones(len(data.idx_val), jnp.float32)

    def step_fn(params, state, opt_state, batch, step_key, nb,
                features, tk_cols, tk_vals):
        return train_step(params, state, opt_state, features, tk_cols,
                          tk_vals, batch, step_key, nb)

    def eval_fn(params, state):
        return eval_step(params, state, features, tk_cols, tk_vals,
                         val_rows, val_labels, val_mask)

    batch_transform = None
    if mesh is not None:
        from grandtpu.dist.data_parallel import shard_batch
        batch_transform = lambda b: shard_batch(mesh, b)  # noqa: E731

    out = run_training_loop(
        cfg, rng, key, params=params, state=state, opt_state=opt_state,
        step_fn=step_fn, eval_fn=eval_fn,
        train_positions=tk.row_positions(data.idx_train),
        sample_positions=tk.row_positions(idx_sample),
        train_labels_all=labels_int[data.idx_train],
        edges_per_step=(cfg.batch_size + cfg.unlabel_batch_size) * tk.k
        * cfg.sample,
        verbose=verbose, batch_transform=batch_transform,
        step_operands=(features, tk_cols, tk_vals))
    best = out["best"]

    # exact full-graph propagation test with the best weights; with a mesh
    # this is the memory-critical step (reference HOT LOOP #3,
    # model.py:186-210) and runs row-partitioned over the devices
    with profile_trace(cfg.profile_dir):
        if mesh is not None:
            from grandtpu.dist import dist_exact_propagate
            prop = dist_exact_propagate(
                mesh, adj_sl, np.asarray(data.features, np.float32),
                mode=cfg.prop_mode, order=cfg.order, alpha=cfg.alpha,
                precision=cfg.predict_precision)
        else:
            prop = exact_propagate(adj_sl, np.asarray(data.features),
                                   mode=cfg.prop_mode, order=cfg.order,
                                   alpha=cfg.alpha,
                                   precision=cfg.predict_precision)
        test_acc = test_accuracy(best["params"], best["state"], mlp_cfg,
                                 prop, data.idx_test, labels_int)
    total_time = time.time() - t_start
    verbose(f"Total time elapsed: {total_time:.4f}s")
    verbose(f"Test Accuracy {test_acc:.4f}")
    bt = out["batch_times"]
    return TrainResult(
        test_acc=test_acc, best_val_acc=best["acc"],
        best_val_loss=best["loss"], num_batches=out["num_batch"],
        total_time=total_time,
        batch_time_avg=float(np.mean(bt)) if bt else 0.0,
        batch_time_median=float(np.median(bt)) if bt else 0.0,
        preprocess_time=preprocess_time,
        params=best["params"], state=best["state"],
        history=out["history"])
