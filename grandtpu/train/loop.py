"""Shared host-side training loop (dense and sparse engines).

Owns everything the reference's epoch x batch loop does around the jitted
step (``model.py:302-362``): epoch-granularity batch assembly + single
upload, eval-every-eval_batch early stopping with acc/both stop modes,
best-state capture, checkpointing, resume, and metrics.

Engine differences are injected: ``step_fn(params, state, opt_state, batch,
key, num_batch)`` closes over its device tensors, ``eval_fn(params, state)``
returns (val_loss, val_acc), and ``batch_transform`` optionally reshapes the
per-step batch (mesh sharding).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from grandtpu.config import GrandConfig
from grandtpu.observe import MetricsLogger, StepTimer
from grandtpu.train.checkpoint import load_checkpoint, save_checkpoint


def pad_batch(idx: np.ndarray, size: int):
    """Pad a partial batch by wrapping its own rows; mask marks real rows."""
    mask = np.zeros(size, dtype=np.float32)
    mask[: idx.shape[0]] = 1.0
    if idx.shape[0] < size:
        reps = -(-size // idx.shape[0])
        idx = np.tile(idx, reps)[:size]
    return idx, mask


def run_training_loop(cfg: GrandConfig, rng, key, *, params, state,
                      opt_state, step_fn, eval_fn, train_positions,
                      sample_positions, train_labels_all, edges_per_step,
                      verbose, batch_transform=None):
    """Run the full early-stopped training. Returns a dict with best state,
    final params/state/opt_state, counters, batch_times, history."""
    best = {"acc": 0.0, "loss": np.inf, "params": params, "state": state,
            "batch": 0, "epoch": 0}
    bad_counter = 0
    num_batch = 0
    batch_times: list[float] = []
    history: list[dict] = []
    stop = False

    metrics_log = MetricsLogger(cfg.metrics_path)
    timer = StepTimer(edges_per_step=edges_per_step)
    if cfg.resume and cfg.ckpt_dir:
        latest = f"{cfg.ckpt_dir}/latest.npz"
        try:
            params, state, opt_state, meta = load_checkpoint(
                latest, params_template=params, state_template=state,
                opt_template=opt_state)
            num_batch = int(meta["num_batch"])
            best["acc"] = float(meta["best_val_acc"])
            best["loss"] = float(meta["best_val_loss"])
            # the best weights live in best.npz, NOT in latest.npz — a
            # resumed run that never improves must still test with them
            try:
                bp, bs, _, _ = load_checkpoint(
                    f"{cfg.ckpt_dir}/best.npz", params_template=params,
                    state_template=state)
                best["params"], best["state"] = bp, bs
            except FileNotFoundError:
                best["params"], best["state"] = params, state
            verbose(f"resumed from {latest} at batch {num_batch}")
        except FileNotFoundError:
            verbose(f"no checkpoint at {latest}; starting fresh")

    for epoch in range(cfg.epochs):
        # assemble the WHOLE epoch's batches host-side and upload once:
        # per-step host->device transfers cost a round trip each, dwarfing
        # the sub-millisecond device step
        order_perm = rng.permutation(len(train_positions))
        n_steps = -(-len(order_perm) // cfg.batch_size)
        rows_np = np.empty((n_steps, cfg.batch_size
                            + cfg.unlabel_batch_size), np.int32)
        labels_np = np.empty((n_steps, cfg.batch_size), np.int32)
        masks_np = np.empty((n_steps, cfg.batch_size), np.float32)
        for i, start in enumerate(range(0, len(order_perm),
                                        cfg.batch_size)):
            sel = order_perm[start: start + cfg.batch_size]
            tr_idx, label_mask = pad_batch(sel, cfg.batch_size)
            # unlabeled batch: uniform subsample (reference model.py:107-113)
            un_sel = rng.permutation(len(sample_positions))[
                : cfg.unlabel_batch_size]
            un_idx, _ = pad_batch(un_sel, cfg.unlabel_batch_size)
            rows_np[i] = np.concatenate([train_positions[tr_idx],
                                         sample_positions[un_idx]])
            labels_np[i] = train_labels_all[tr_idx]
            masks_np[i] = label_mask
        rows_e = jnp.asarray(rows_np)
        labels_e = jnp.asarray(labels_np)
        masks_e = jnp.asarray(masks_np)
        key, sub = jax.random.split(key)
        keys_e = jax.random.split(sub, n_steps)
        nb_e = jnp.arange(num_batch, num_batch + n_steps, dtype=jnp.float32)

        for i in range(n_steps):
            bt0 = time.time()
            batch = {"rows": rows_e[i], "labels": labels_e[i],
                     "label_mask": masks_e[i]}
            if batch_transform is not None:
                batch = batch_transform(batch)
            with timer:
                params, state, opt_state, metrics = step_fn(
                    params, state, opt_state, batch, keys_e[i], nb_e[i])
            batch_times.append(time.time() - bt0)

            if num_batch % cfg.eval_batch == 0:
                val_loss, val_acc = eval_fn(params, state)
                val_loss, val_acc = float(val_loss), float(val_acc)
                train_loss = float(metrics["loss"])
                history.append({"batch": num_batch, "val_loss": val_loss,
                                "val_acc": val_acc, "loss": train_loss})
                metrics_log.log(batch=num_batch, epoch=epoch,
                                val_loss=val_loss, val_acc=val_acc,
                                train_loss=train_loss,
                                batch_time_s=batch_times[-1])
                verbose(f"epoch {epoch}, batch {num_batch}, "
                        f"validation loss {val_loss:.4f}, "
                        f"validation acc {val_acc:.4f}")
                improved = False
                # reference improvement rule (model.py:344-346)
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
                    best_val_acc=best["acc"], **timer.summary())
    metrics_log.close()
    verbose(f"Optimization finished. Best val acc {best['acc']:.4f} "
            f"at batch {best['batch']}")
    return {"best": best, "num_batch": num_batch,
            "batch_times": batch_times, "history": history,
            "params": params, "state": state, "opt_state": opt_state}
