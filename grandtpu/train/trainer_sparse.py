"""Sparse-feature (MAG-style) training engine.

Reference ``model_mag.py:248-413``. Differences from the dense engine that
this file preserves:

- the input layer is the embedding weighted-mean over padded attr rows, run
  INSIDE the K-augmentation loop with fresh dropout (``model_mag.py:355``);
- random_prop output is NOT detached (``model_mag.py:356``) — gradients flow
  into the embedding table through the propagation;
- warmup ramp is ``min(1, nb/warmup) * lam`` (``model_mag.py:364``;
  equivalent to the dense form for lam > 0);
- prediction propagates in EMBEDDING space: all-node embeddings [N, H] are
  computed once, power-iterated through the graph, then pushed through the
  head (``model_mag.py:192-233``) — never materializing dense [N, F]
  features (the key memory trick for 2.8M-feature MAG).
"""

from __future__ import annotations

import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from grandtpu.config import GrandConfig
from grandtpu.data import GraphData, load_data
from grandtpu.data.preprocess import add_self_loops_adj
from grandtpu.nn.dropnode import random_prop
from grandtpu.nn.losses import consis_loss
from grandtpu.nn.mag_mlp import apply_mag_head, init_mag_mlp
from grandtpu.nn.mlp import MLPConfig
from grandtpu.nn.sparse_input import PaddedFeatures, embed_nodes
from grandtpu.ppr import gfpush
from grandtpu.train.step import make_optimizer
from grandtpu.train.loop import run_training_loop
from grandtpu.train.trainer import TrainResult


def _build_sparse_steps(mlp_cfg: MLPConfig, cfg: GrandConfig, optimizer,
                        n_class: int):
    conf = cfg.resolve_conf(n_class)

    def forward_k(params, state, attr_cols, attr_vals, tk_cols, tk_vals,
                  rows, key, training, batch_mask=None):
        cols = jnp.take(tk_cols, rows, axis=0)         # [B, Ktop]
        vals = jnp.take(tk_vals, rows, axis=0)
        b_attr_cols = jnp.take(attr_cols, cols, axis=0)  # [B, Ktop, P]
        b_attr_vals = jnp.take(attr_vals, cols, axis=0)
        keys = jax.random.split(key, cfg.sample)

        def one_aug(carry_state, k):
            k_emb, k_drop, k_head = jax.random.split(k, 3)
            emb = embed_nodes(params["emb"], b_attr_cols, b_attr_vals,
                              key=k_emb, droprate=cfg.input_droprate,
                              training=training)       # [B, Ktop, H]
            x = random_prop(emb, vals, key=k_drop,
                            dropnode_rate=cfg.dropnode_rate,
                            training=training)          # [B, H]; no detach
            logits, carry_state = apply_mag_head(
                params, carry_state, mlp_cfg, x, key=k_head,
                training=training, batch_mask=batch_mask)
            return carry_state, jax.nn.log_softmax(logits, axis=-1)

        # vmap the K augmented forwards (same argument as train/step.py:
        # train-mode BN reads only its own batch stats; the running-stat
        # EMA chain folds in closed form afterwards, exactly equal to K
        # sequential updates)
        states_k, logps = jax.vmap(lambda k: one_aug(state, k))(keys)
        if not (training and mlp_cfg.use_bn):
            return logps, state

        from grandtpu.nn.mlp import BN_MOMENTUM

        def fold(s0_leaf, nk_leaf):
            out = s0_leaf
            for j in range(cfg.sample):
                out = (1.0 - BN_MOMENTUM) * out + (
                    nk_leaf[j] - (1.0 - BN_MOMENTUM) * s0_leaf)
            return out

        return logps, jax.tree_util.tree_map(fold, state, states_k)

    def loss_fn(params, state, attr_cols, attr_vals, tk_cols, tk_vals,
                batch, key, num_batch):
        nt = cfg.batch_size
        # real-row mask: padding drops out of BN stats + consistency loss
        # (the reference feeds the true smaller batch, model_mag.py:303)
        um = batch.get("unlabel_mask")
        if um is None:
            um = jnp.ones(batch["rows"].shape[0] - nt, jnp.float32)
        bmask = jnp.concatenate([batch["label_mask"], um])
        logps, new_state = forward_k(
            params, state, attr_cols, attr_vals, tk_cols, tk_vals,
            batch["rows"], key, True,
            batch_mask=bmask if cfg.use_bn else None)
        picked = jnp.take_along_axis(
            logps[:, :nt], batch["labels"][None, :, None], axis=-1)[..., 0]
        mask = batch["label_mask"]
        sup = (-(picked * mask[None]).sum(-1)
               / jnp.maximum(mask.sum(), 1.0)).mean()
        ramp = jnp.minimum(1.0, num_batch / cfg.warmup) * cfg.lam
        unsup = consis_loss(logps[:, nt:], cfg.tem, conf, cfg.loss,
                            row_mask=um)
        return sup + ramp * unsup, new_state

    @jax.jit
    def train_step(params, state, opt_state, attr_cols, attr_vals, tk_cols,
                   tk_vals, batch, key, num_batch):
        (loss, new_state), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, state, attr_cols, attr_vals,
                                   tk_cols, tk_vals, batch, key, num_batch)
        if cfg.clip_norm > 0:
            gnorm = optax.global_norm(grads)
            scale = jnp.minimum(1.0, cfg.clip_norm / (gnorm + 1e-6))
            grads = jax.tree.map(lambda g: g * scale, grads)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_state, opt_state, loss

    @jax.jit
    def eval_step(params, state, attr_cols, attr_vals, tk_cols, tk_vals,
                  rows, labels, mask):
        cols = jnp.take(tk_cols, rows, axis=0)
        vals = jnp.take(tk_vals, rows, axis=0)
        b_attr_cols = jnp.take(attr_cols, cols, axis=0)
        b_attr_vals = jnp.take(attr_vals, cols, axis=0)
        emb = embed_nodes(params["emb"], b_attr_cols, b_attr_vals,
                          training=False)
        x = random_prop(emb, vals, training=False)
        logits, _ = apply_mag_head(params, state, mlp_cfg, x,
                                   training=False)
        logps = jax.nn.log_softmax(logits, axis=-1)
        picked = jnp.take_along_axis(logps, labels[:, None], axis=-1)[:, 0]
        denom = jnp.maximum(mask.sum(), 1.0)
        nll = -(picked * mask).sum() / denom
        acc = ((jnp.argmax(logps, -1) == labels) * mask).sum() / denom
        return nll, acc

    return train_step, eval_step


def train_sparse(cfg: GrandConfig, data: Optional[GraphData] = None,
                 log=None) -> TrainResult:
    verbose = log if log is not None else (print if cfg.visible else
                                           (lambda *a, **k: None))
    rng = np.random.RandomState(cfg.seed2)
    if data is None:
        data = load_data(cfg.dataset, split_seed=cfg.seed1)
    assert data.has_sparse_features, "use train() for dense features"

    t_start = time.time()
    adj_sl = add_self_loops_adj(data.adj)
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
    padded = PaddedFeatures.from_csr(data.features)
    preprocess_time = time.time() - t_start
    verbose(f"preprocessing done, time: {preprocess_time:.3f}s")

    attr_cols = jnp.asarray(padded.attr_cols)
    attr_vals = jnp.asarray(padded.attr_vals)
    tk_cols = jnp.asarray(tk.cols)
    tk_vals = jnp.asarray(tk.vals)
    labels_int = data.labels_int
    n_class = data.num_classes

    mesh = None
    if cfg.num_devices > 1:
        if len(jax.devices()) < cfg.num_devices:
            raise ValueError(
                f"num_devices={cfg.num_devices} but only "
                f"{len(jax.devices())} devices visible")
        from grandtpu.dist import make_mesh
        mesh = make_mesh(n_data=cfg.num_devices, n_model=1)

    mlp_cfg = MLPConfig(
        num_features=padded.num_features, num_classes=n_class,
        hidden=cfg.hidden, nlayers=cfg.nlayers, use_bn=cfg.use_bn,
        node_norm=cfg.node_norm, input_droprate=cfg.input_droprate,
        hidden_droprate=cfg.hidden_droprate)

    key = jax.random.PRNGKey(cfg.seed2)
    key, init_key = jax.random.split(key)
    params, state = init_mag_mlp(init_key, mlp_cfg)
    optimizer = make_optimizer(cfg.lr, cfg.weight_decay)
    opt_state = optimizer.init(params)
    train_step, eval_step = _build_sparse_steps(
        mlp_cfg, cfg, optimizer, n_class)

    batch_transform = None
    row_padded: dict = {}
    if mesh is not None:
        # GSPMD placement: vocab-sharded embedding table (+Adam moments),
        # row-sharded attr/top-k tables, dp over batch rows
        from grandtpu.dist.data_parallel import (shard_batch,
                                                 shard_sparse_train_inputs)
        from grandtpu.train.checkpoint import row_padded_meta
        _before = {"params": params, "opt": opt_state}
        (params, state, opt_state, attr_cols, attr_vals, tk_cols,
         tk_vals) = shard_sparse_train_inputs(
            mesh, params=params, state=state, opt_state=opt_state,
            attr_cols=attr_cols, attr_vals=attr_vals, tk_cols=tk_cols,
            tk_vals=tk_vals, emb_mode="vocab")
        # record which leaves vocab-padding grew so checkpoint restore may
        # slice exactly those (and nothing else) back to the true vocab
        row_padded = row_padded_meta(
            _before, {"params": params, "opt": opt_state})
        del _before
        batch_transform = lambda b: shard_batch(mesh, b)  # noqa: E731

    val_rows = jnp.asarray(tk.row_positions(data.idx_val))
    val_labels = jnp.asarray(labels_int[data.idx_val])
    val_mask = jnp.ones(len(data.idx_val), jnp.float32)
    sample_positions = tk.row_positions(idx_sample)
    train_positions = tk.row_positions(data.idx_train)
    train_labels_all = labels_int[data.idx_train]

    def step_fn(params, state, opt_state, batch, step_key, nb,
                attr_cols, attr_vals, tk_cols, tk_vals):
        params, state, opt_state, loss = train_step(
            params, state, opt_state, attr_cols, attr_vals, tk_cols,
            tk_vals, batch, step_key, nb)
        return params, state, opt_state, {"loss": loss}

    def eval_fn(params, state):
        return eval_step(params, state, attr_cols, attr_vals, tk_cols,
                         tk_vals, val_rows, val_labels, val_mask)

    out = run_training_loop(
        cfg, rng, key, params=params, state=state, opt_state=opt_state,
        step_fn=step_fn, eval_fn=eval_fn,
        train_positions=train_positions,
        sample_positions=sample_positions,
        train_labels_all=train_labels_all,
        edges_per_step=(cfg.batch_size + cfg.unlabel_batch_size) * tk.k
        * cfg.sample,
        verbose=verbose, batch_transform=batch_transform,
        step_operands=(attr_cols, attr_vals, tk_cols, tk_vals),
        row_padded=row_padded)
    best = out["best"]
    num_batch = out["num_batch"]
    batch_times = out["batch_times"]
    history = out["history"]

    # predict: all-node embeddings -> propagate in embedding space -> head
    # (reference model_mag.py:192-233), phase-wise so MAG-scale memory
    # fits: the [n, H] power iteration must not coexist with the training
    # operands on a single chip (12.4M nodes: attr tables 2.4GB + Adam
    # moments 1.4GB + ~3x [n, H] f32 carries 9.5GB + operator 3.5GB > 16GB)
    from grandtpu.infer.classify import embed_all_nodes, head_logits
    from grandtpu.observe import profile_trace
    bp, bs = best["params"], best["state"]
    if mesh is not None:
        # fetch_leaf replicates cross-process-sharded leaves (the vocab-
        # sharded table under world>1) before the host fetch — a plain
        # np.asarray would raise on non-addressable shards
        from grandtpu.dist.mesh import fetch_leaf
        bp = jax.tree.map(lambda x: jnp.asarray(fetch_leaf(x)), bp)
        bs = jax.tree.map(lambda x: jnp.asarray(fetch_leaf(x)), bs)
    with profile_trace(cfg.profile_dir):
        # phase 1 — embeddings. No mesh: reuse the resident attr tables;
        # mesh: they were row-padded/sharded, so upload the raw ones.
        if mesh is None:
            embs = embed_all_nodes(bp, attr_cols, attr_vals)
        else:
            embs = embed_all_nodes(bp, jnp.asarray(padded.attr_cols),
                                   jnp.asarray(padded.attr_vals))
        # phase 2 — release every training-held device reference before
        # the propagation allocates its carries. Rebinding the locals
        # updates step_fn/eval_fn's closure cells, so the buffers free.
        attr_cols = attr_vals = tk_cols = tk_vals = None
        opt_state = None
        out["params"] = out["state"] = out["opt_state"] = None
        best["params"] = best["state"] = None
        # the [vocab, H] table (712MB at MAG scale) is not read again
        # until the TrainResult return — park it on the host through the
        # propagation (head_logits reads only fcs/bns)
        bp = {**bp, "emb": jax.tree.map(lambda x: np.asarray(x),
                                        bp["emb"])}
        if mesh is not None:
            # row-partitioned power iteration (memory splits over devices)
            from grandtpu.dist import dist_exact_propagate
            prop = dist_exact_propagate(
                mesh, adj_sl, embs, mode=cfg.prop_mode, order=cfg.order,
                alpha=cfg.alpha, precision=cfg.predict_precision)
        else:
            from grandtpu.infer import exact_propagate
            prop = exact_propagate(adj_sl, embs, mode=cfg.prop_mode,
                                   order=cfg.order, alpha=cfg.alpha,
                                   precision=cfg.predict_precision)
        del embs
        logits = head_logits(bp, bs, mlp_cfg, prop)
        del prop
    preds = logits.argmax(1)
    test_acc = float(np.equal(preds[data.idx_test],
                              labels_int[data.idx_test]).mean())
    total_time = time.time() - t_start
    verbose(f"Test Accuracy {test_acc:.4f}")
    return TrainResult(
        test_acc=test_acc, best_val_acc=best["acc"],
        best_val_loss=best["loss"], num_batches=num_batch,
        total_time=total_time,
        batch_time_avg=float(np.mean(batch_times)) if batch_times else 0.0,
        batch_time_median=float(np.median(batch_times))
        if batch_times else 0.0,
        preprocess_time=preprocess_time,
        params=bp, state=bs, history=history)
