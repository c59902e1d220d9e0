"""Host-side experiment loop: the L3 engine (dense-feature path).

Reproduces reference ``main`` (``model.py:227-373``) around the jitted step:

  load -> self-loops -> unlabeled pool -> GFPush top-k -> device-resident
  (features, top-k table) -> epoch x batch loop with K augmentations ->
  eval-every-eval_batch early stopping with best-state capture -> exact
  full-graph propagation test.

All shapes entering jit are static: partial train batches are padded with
duplicated rows and masked out of the loss (documented divergence: with BN
on, duplicated rows re-weight batch statistics slightly on the final
partial batch of each epoch; the reference feeds the smaller batch instead).
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
from grandtpu.observe import MetricsLogger, StepTimer, profile_trace
from grandtpu.ppr import gfpush
from grandtpu.train.checkpoint import load_checkpoint, save_checkpoint
from grandtpu.train.step import (StepConfig, build_eval_step,
                                 build_train_step, make_optimizer)


@dataclasses.dataclass
class TrainResult:
    test_acc: float
    best_val_acc: float
    best_val_loss: float
    num_batches: int
    total_time: float
    batch_time_avg: float
    preprocess_time: float
    params: object = None
    state: object = None
    history: list = dataclasses.field(default_factory=list)


def _pad_batch(idx: np.ndarray, size: int):
    """Pad a partial batch by wrapping its own rows; mask marks real rows."""
    mask = np.zeros(size, dtype=np.float32)
    mask[: idx.shape[0]] = 1.0
    if idx.shape[0] < size:
        reps = -(-size // idx.shape[0])
        idx = np.tile(idx, reps)[:size]
    return idx, mask


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

    tk = gfpush(adj_sl, sources, prop_mode=cfg.prop_mode, order=cfg.order,
                alpha=cfg.alpha, rmax=cfg.rmax, k=cfg.top_k,
                backend=cfg.push_backend)
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
        clip_norm=cfg.clip_norm, pallas_dropnode=cfg.pallas_dropnode)

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

    sample_positions = tk.row_positions(idx_sample)
    train_positions = tk.row_positions(data.idx_train)
    train_labels_all = labels_int[data.idx_train]

    best = {"acc": 0.0, "loss": np.inf, "params": params, "state": state,
            "batch": 0, "epoch": 0}
    bad_counter = 0
    num_batch = 0
    batch_times = []
    history = []
    stop = False

    metrics_log = MetricsLogger(cfg.metrics_path)
    timer = StepTimer(edges_per_step=(cfg.batch_size
                                      + cfg.unlabel_batch_size) * tk.k
                      * cfg.sample)
    if cfg.resume and cfg.ckpt_dir:
        latest = f"{cfg.ckpt_dir}/latest.npz"
        try:
            params, state, opt_state, meta = load_checkpoint(
                latest, params_template=params, state_template=state,
                opt_template=opt_state)
            num_batch = int(meta["num_batch"])
            best["acc"] = float(meta["best_val_acc"])
            best["loss"] = float(meta["best_val_loss"])
            best["params"], best["state"] = params, state
            verbose(f"resumed from {latest} at batch {num_batch}")
        except FileNotFoundError:
            verbose(f"no checkpoint at {latest}; starting fresh")

    for epoch in range(cfg.epochs):
        # assemble the WHOLE epoch's batches host-side and upload once:
        # per-step host->device transfers would cost a tunnel round trip
        # each, dwarfing the ~0.3-0.6ms device step
        order_perm = rng.permutation(len(train_positions))
        n_steps = -(-len(order_perm) // cfg.batch_size)
        rows_np = np.empty((n_steps, cfg.batch_size
                            + cfg.unlabel_batch_size), np.int32)
        labels_np = np.empty((n_steps, cfg.batch_size), np.int32)
        masks_np = np.empty((n_steps, cfg.batch_size), np.float32)
        for i, start in enumerate(range(0, len(order_perm),
                                        cfg.batch_size)):
            sel = order_perm[start: start + cfg.batch_size]
            tr_idx, label_mask = _pad_batch(sel, cfg.batch_size)
            # unlabeled batch: uniform subsample (reference
            # model.py:107-113)
            un_sel = rng.permutation(len(sample_positions))[
                : cfg.unlabel_batch_size]
            un_idx, _ = _pad_batch(un_sel, cfg.unlabel_batch_size)
            rows_np[i] = np.concatenate([train_positions[tr_idx],
                                         sample_positions[un_idx]])
            labels_np[i] = train_labels_all[tr_idx]
            masks_np[i] = label_mask
        rows_e = jnp.asarray(rows_np)
        labels_e = jnp.asarray(labels_np)
        masks_e = jnp.asarray(masks_np)
        key, sub = jax.random.split(key)
        keys_e = jax.random.split(sub, n_steps)
        nb_e = jnp.arange(num_batch, num_batch + n_steps,
                          dtype=jnp.float32)

        for i in range(n_steps):
            bt0 = time.time()
            batch = {"rows": rows_e[i], "labels": labels_e[i],
                     "label_mask": masks_e[i]}
            if mesh is not None:
                from grandtpu.dist.data_parallel import shard_batch
                batch = shard_batch(mesh, batch)
            with timer:
                params, state, opt_state, metrics = train_step(
                    params, state, opt_state, features, tk_cols, tk_vals,
                    batch, keys_e[i], nb_e[i])
            batch_times.append(time.time() - bt0)

            if num_batch % cfg.eval_batch == 0:
                val_loss, val_acc = eval_step(
                    params, state, features, tk_cols, tk_vals, val_rows,
                    val_labels, val_mask)
                val_loss, val_acc = float(val_loss), float(val_acc)
                history.append({"batch": num_batch, "val_loss": val_loss,
                                "val_acc": val_acc,
                                "loss": float(metrics["loss"])})
                metrics_log.log(batch=num_batch, epoch=epoch,
                                val_loss=val_loss, val_acc=val_acc,
                                train_loss=float(metrics["loss"]),
                                batch_time_s=batch_times[-1])
                verbose(f"epoch {epoch}, batch {num_batch}, "
                        f"validation loss {val_loss:.4f}, "
                        f"validation acc {val_acc:.4f}")
                improved = False
                if val_acc >= best["acc"]:
                    if cfg.stop_mode == "acc" or (
                            cfg.stop_mode == "both"
                            and val_loss <= best["loss"]):
                        best.update(acc=val_acc, loss=val_loss,
                                    params=params, state=state,
                                    batch=num_batch, epoch=epoch)
                        bad_counter = 0
                        improved = True
                else:
                    bad_counter += 1
                if cfg.ckpt_dir:
                    if improved:
                        save_checkpoint(
                            f"{cfg.ckpt_dir}/best.npz", params=params,
                            state=state, num_batch=num_batch,
                            best_val_acc=best["acc"],
                            best_val_loss=best["loss"])
                    n_evals = num_batch // cfg.eval_batch
                    if cfg.save_every and n_evals % cfg.save_every == 0:
                        save_checkpoint(
                            f"{cfg.ckpt_dir}/latest.npz", params=params,
                            state=state, opt_state=opt_state,
                            num_batch=num_batch,
                            best_val_acc=best["acc"],
                            best_val_loss=best["loss"])
                if bad_counter >= cfg.patience:
                    verbose(f"Early stop! Min loss: {best['loss']:.4f}, "
                            f"Max accuracy: {best['acc']:.4f}, "
                            f"num batch: {num_batch}, epoch: {epoch}")
                    stop = True
                    break
            num_batch += 1
        if stop:
            break
    metrics_log.log(event="train_end", num_batch=num_batch,
                    best_val_acc=best["acc"],
                    **timer.summary())
    metrics_log.close()

    verbose(f"Optimization finished. Best val acc {best['acc']:.4f} "
            f"at batch {best['batch']}")

    # exact full-graph propagation test with the best weights
    with profile_trace(cfg.profile_dir):
        prop = exact_propagate(adj_sl, np.asarray(data.features),
                               mode=cfg.prop_mode, order=cfg.order,
                               alpha=cfg.alpha)
        test_acc = test_accuracy(best["params"], best["state"], mlp_cfg,
                                 prop, data.idx_test, labels_int)
    total_time = time.time() - t_start
    verbose(f"Total time elapsed: {total_time:.4f}s")
    verbose(f"Test Accuracy {test_acc:.4f}")
    return TrainResult(
        test_acc=test_acc, best_val_acc=best["acc"],
        best_val_loss=best["loss"], num_batches=num_batch,
        total_time=total_time,
        batch_time_avg=float(np.mean(batch_times)) if batch_times else 0.0,
        preprocess_time=preprocess_time,
        params=best["params"], state=best["state"], history=history)
