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

import signal
import threading
import time

import jax
import jax.numpy as jnp
import numpy as np

from grandtpu.config import GrandConfig
from grandtpu.observe import MetricsLogger, StepTimer
from grandtpu.train.checkpoint import load_checkpoint, save_checkpoint

# scan a group length only after this many occurrences, and compile at
# most MAX_SCAN_SIZES distinct lengths (each is a separate ~15-20s XLA
# compile through the remote-compile tunnel; per-step dispatch is async
# and already overlaps device compute, so scanning only pays for small
# steps and dominant recurring sizes — see _build_multi_step)
SCAN_COMPILE_THRESHOLD = 3
MAX_SCAN_SIZES = 2


def _plan_groups(nb0: int, n_steps: int, eval_batch: int):
    """Split an epoch's steps into scan groups that END exactly at the
    eval boundaries (num_batch % eval_batch == 0) or at the epoch end, so
    grouped execution hits the identical eval/early-stop schedule as
    per-step execution. Returns [(epoch-local start, length, eval_after)].
    """
    groups = []
    i = 0
    while i < n_steps:
        nb = nb0 + i
        nxt = nb if nb % eval_batch == 0 else \
            nb + (eval_batch - nb % eval_batch)
        k = min(nxt - nb + 1, n_steps - i)
        groups.append((i, k, nb + k - 1 == nxt))
        i += k
    return groups


def _build_multi_step(step_fn):
    """Roll K consecutive train steps into one device dispatch via
    lax.scan. Per-call SYNCHRONOUS dispatch costs ~1.4ms/step while the
    small-model device step is ~0.5ms (measured, v5e) — but the per-step
    loop dispatches asynchronously and overlaps the device, so in practice
    scanning only wins on sub-ms steps over runs long enough to amortize
    one ~15-20s remote compile per distinct group length (>~20K steps).
    Hence opt-in via cfg.scan_steps; measured NET LOSS on typical
    early-stopped runs (aminer-like 30 epochs: 47s vs 20s).

    The engine's large device operands (feature matrix, top-k tables) MUST
    arrive via *operands, not a closure: closure capture bakes them into
    the jaxpr as constants, which blows up the serialized compile payload
    (the axon remote-compile endpoint rejects >some-100MB with HTTP 413).
    """
    @jax.jit
    def multi(params, state, opt_state, batches, keys, nbs, *operands):
        def body(carry, xs):
            p, s, o = carry
            b, k, nb = xs
            p, s, o, m = step_fn(p, s, o, b, k, nb, *operands)
            return (p, s, o), m
        (params, state, opt_state), ms = jax.lax.scan(
            body, (params, state, opt_state), (batches, keys, nbs))
        return params, state, opt_state, ms
    return multi


class _PreemptionGuard:
    """Graceful preemption (new vs the reference, which has no failure
    handling — SURVEY.md §5): SIGTERM/SIGINT set a flag; the loop finishes
    the in-flight step group, checkpoints full state to latest, and stops,
    so a ``resume=True`` rerun continues where the preemption hit. TPU
    pod preemptions deliver exactly this signal pattern.

    Handlers only install on the main thread (signal module limitation);
    elsewhere the guard is inert.
    """

    _SIGNALS = (signal.SIGTERM, signal.SIGINT)

    def __init__(self):
        self.requested = False
        self._prev = {}

    def _handler(self, signum, frame):
        self.requested = True

    def __enter__(self):
        if threading.current_thread() is threading.main_thread():
            for s in self._SIGNALS:
                self._prev[s] = signal.signal(s, self._handler)
        return self

    def __exit__(self, *exc):
        for s, h in self._prev.items():
            signal.signal(s, h)
        return False


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
                      verbose, batch_transform=None, step_operands=(),
                      row_padded=None):
    """Run the full early-stopped training. Returns a dict with best state,
    final params/state/opt_state, counters, batch_times, history.

    step_fn(params, state, opt_state, batch, key, nb, *step_operands) —
    the engine's device-resident tensors travel as explicit operands so
    scan-rolled dispatch can pass them as jit arguments (see
    _build_multi_step)."""
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

    multi_step = (_build_multi_step(step_fn)
                  if cfg.scan_steps and batch_transform is None else None)
    # each distinct group length is a separate XLA compile (~20s through
    # the remote-compile tunnel): only scan a length once it has recurred
    # enough to amortize, cap the number of compiled lengths, and run
    # everything else per-step
    scan_seen: dict[int, int] = {}
    scan_sizes: set[int] = set()

    preempted = False
    guard = _PreemptionGuard()
    with guard:
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
            umasks_np = np.empty((n_steps, cfg.unlabel_batch_size),
                                 np.float32)
            for i, start in enumerate(range(0, len(order_perm),
                                            cfg.batch_size)):
                sel = order_perm[start: start + cfg.batch_size]
                tr_idx, label_mask = pad_batch(sel, cfg.batch_size)
                # unlabeled batch: uniform subsample (reference model.py:107-113)
                un_sel = rng.permutation(len(sample_positions))[
                    : cfg.unlabel_batch_size]
                un_idx, un_mask = pad_batch(un_sel, cfg.unlabel_batch_size)
                rows_np[i] = np.concatenate([train_positions[tr_idx],
                                             sample_positions[un_idx]])
                labels_np[i] = train_labels_all[tr_idx]
                masks_np[i] = label_mask
                umasks_np[i] = un_mask
            rows_e = jnp.asarray(rows_np)
            labels_e = jnp.asarray(labels_np)
            masks_e = jnp.asarray(masks_np)
            umasks_e = jnp.asarray(umasks_np)
            key, sub = jax.random.split(key)
            keys_e = jax.random.split(sub, n_steps)
            nb_e = jnp.arange(num_batch, num_batch + n_steps, dtype=jnp.float32)

            for i0, k, eval_after in _plan_groups(num_batch, n_steps,
                                                  cfg.eval_batch):
                bt0 = time.time()
                scan_seen[k] = scan_seen.get(k, 0) + 1
                if (k > 1 and k not in scan_sizes
                        and len(scan_sizes) < MAX_SCAN_SIZES
                        and scan_seen[k] >= SCAN_COMPILE_THRESHOLD):
                    scan_sizes.add(k)
                if multi_step is not None and k in scan_sizes:
                    params, state, opt_state, ms = multi_step(
                        params, state, opt_state,
                        {"rows": rows_e[i0: i0 + k],
                         "labels": labels_e[i0: i0 + k],
                         "label_mask": masks_e[i0: i0 + k],
                         "unlabel_mask": umasks_e[i0: i0 + k]},
                        keys_e[i0: i0 + k], nb_e[i0: i0 + k], *step_operands)
                    last_loss = ms["loss"][-1]
                else:
                    for i in range(i0, i0 + k):
                        batch = {"rows": rows_e[i], "labels": labels_e[i],
                                 "label_mask": masks_e[i],
                                 "unlabel_mask": umasks_e[i]}
                        if batch_transform is not None:
                            batch = batch_transform(batch)
                        params, state, opt_state, metrics = step_fn(
                            params, state, opt_state, batch, keys_e[i],
                            nb_e[i], *step_operands)
                    last_loss = metrics["loss"]
                dt = (time.time() - bt0) / k
                batch_times.extend([dt] * k)
                timer.times.extend([dt] * k)
                num_batch += k - 1    # num_batch = global index of last step

                if eval_after and num_batch % cfg.eval_batch == 0:
                    val_loss, val_acc = eval_fn(params, state)
                    val_loss, val_acc = float(val_loss), float(val_acc)
                    train_loss = float(last_loss)
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
                                best_val_loss=best["loss"],
                                row_padded=row_padded,
                                backend=cfg.ckpt_backend)
                        n_evals = num_batch // cfg.eval_batch
                        if cfg.save_every and n_evals % cfg.save_every == 0:
                            # latest.npz convention (all save paths): the
                            # NEXT-step index, so resume never re-runs the
                            # step that produced the checkpoint
                            save_checkpoint(
                                f"{cfg.ckpt_dir}/latest.npz", params=params,
                                state=state, opt_state=opt_state,
                                num_batch=num_batch + 1,
                                best_val_acc=best["acc"],
                                best_val_loss=best["loss"],
                                row_padded=row_padded,
                                backend=cfg.ckpt_backend)
                    if bad_counter >= cfg.patience:
                        verbose(f"Early stop! Min loss: {best['loss']:.4f}, "
                                f"Max accuracy: {best['acc']:.4f}, "
                                f"num batch: {num_batch}, epoch: {epoch}")
                        stop = True
                if stop:
                    # early stop exits BEFORE the increment, matching the
                    # reference's counting (model.py:355-360): the reported
                    # `batch num` is the index of the stopping step
                    break
                num_batch += 1
                if guard.requested:
                    # graceful preemption: full state to latest, then stop.
                    # Signals are PER-RANK and not synchronized, so under
                    # world>1 a collective-fetching save here could pair a
                    # save collective on this rank against a train-step
                    # collective on another and deadlock — only save when
                    # the save needs no collectives (every leaf locally
                    # addressable; true for replicated dense state) or
                    # when single-process. Sharded world>1 state relies on
                    # the eval-boundary save_every checkpoints, whose
                    # collectives are reached by all ranks in lockstep.
                    saveable = cfg.ckpt_dir and (
                        jax.process_count() == 1
                        or all(getattr(leaf, "is_fully_addressable", True)
                               for leaf in jax.tree.leaves(
                                   (params, state, opt_state))))
                    if saveable:
                        save_checkpoint(
                            f"{cfg.ckpt_dir}/latest.npz", params=params,
                            state=state, opt_state=opt_state,
                            num_batch=num_batch, best_val_acc=best["acc"],
                            best_val_loss=best["loss"],
                            row_padded=row_padded,
                            backend=cfg.ckpt_backend)
                        verbose(f"preemption signal at batch {num_batch}: "
                                f"state saved, stopping (resume=True "
                                f"continues)")
                    else:
                        verbose(f"preemption signal at batch {num_batch}: "
                                f"stopping WITHOUT a fresh save "
                                f"(cross-process-sharded state; the last "
                                f"save_every checkpoint is the resume "
                                f"point)" if cfg.ckpt_dir else
                                f"preemption signal at batch {num_batch}: "
                                f"stopping (no ckpt_dir)")
                    metrics_log.log(event="preempted", num_batch=num_batch)
                    preempted = True
                    stop = True
                    break
            if stop:
                break
    metrics_log.log(event="train_end", num_batch=num_batch,
                    best_val_acc=best["acc"], **timer.summary())
    metrics_log.close()
    verbose(f"Optimization finished. Best val acc {best['acc']:.4f} "
            f"at batch {best['batch']}")
    return {"best": best, "num_batch": num_batch, "preempted": preempted,
            "batch_times": batch_times, "history": history,
            "params": params, "state": state, "opt_state": opt_state}
