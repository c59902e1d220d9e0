"""Jitted train/eval step builders.

One training step reproduces the reference inner loop (``model.py:303-334``)
as a single XLA program:

    for k in 1..K:  feats -> DropNode-weighted mean -> MLP -> log_softmax
    loss = mean_k NLL(labeled rows) + ramp * consis_loss(unlabeled rows)
    grads -> [clip] -> Adam(+coupled weight decay)

Augmentations run under ``lax.scan`` so BatchNorm running statistics update
sequentially across the K forwards exactly as K sequential torch forwards
would. Batches are static [B, K_top] blocks from ``TopKProp``; partial
batches are padded with duplicated rows and masked out of the NLL.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import optax

from grandtpu.nn.dropnode import random_prop
from grandtpu.nn.losses import consis_loss
from grandtpu.nn.mlp import MLPConfig, apply_mlp


@dataclasses.dataclass(frozen=True)
class StepConfig:
    """Static configuration baked into the jitted step."""
    mlp: MLPConfig
    k_aug: int                  # K augmentations (reference --sample)
    dropnode_rate: float
    n_train: int                # labeled rows per batch (batch_size)
    lam: float
    warmup: float
    tem: float
    conf: float
    loss_kind: str              # 'l2' | 'kl'
    clip_norm: float            # <=0 disables


def make_optimizer(lr: float, weight_decay: float) -> optax.GradientTransformation:
    """torch.optim.Adam parity: coupled weight decay added to the gradient
    BEFORE the moment updates (not AdamW), betas (0.9, 0.999), eps 1e-8
    (reference ``model.py:288-289``)."""
    chain = []
    if weight_decay > 0:
        chain.append(optax.add_decayed_weights(weight_decay))
    chain.append(optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8))
    chain.append(optax.scale(-lr))
    return optax.chain(*chain)


def _forward_k(params, state, cfg: StepConfig, features, cols, vals, key,
               training: bool, batch_mask=None):
    """K augmented forwards with sequential BN state threading.
    Returns (log_probs [K, B, C], new_state). batch_mask marks real rows
    for BN statistics on wrap-padded partial batches."""
    keys = jax.random.split(key, cfg.k_aug)
    feats = jnp.take(features, cols, axis=0)              # [B, Ktop, F]

    def one_aug(carry_state, k):
        k_drop, k_mlp = jax.random.split(k)
        # DropNode stays the pure-XLA op: a fused Pallas kernel (in-kernel
        # PRNG + MXU reduction) was built and adjudicated on hardware in
        # r3 — it LOST to XLA's fused threefry+mask+reduce on every preset
        # shape (RESULTS.md train-step table), so it was deleted.
        x = random_prop(feats, vals, key=k_drop,
                        dropnode_rate=cfg.dropnode_rate,
                        training=training)
        x = jax.lax.stop_gradient(x)   # reference detaches the augmentation
        logits, carry_state = apply_mlp(params, carry_state, cfg.mlp, x,
                                        key=k_mlp, training=training,
                                        batch_mask=batch_mask)
        return carry_state, jax.nn.log_softmax(logits, axis=-1)

    # The K forwards are state-INDEPENDENT even with BN on: train-mode BN
    # normalizes with each augmentation's own batch stats and only the
    # running-stat EMA reads the incoming state — so vmap all K into one
    # batched program (r1/r2 scanned them sequentially whenever use_bn)
    # and fold the EMA chain in closed form afterwards.
    states_k, logps = jax.vmap(lambda k: one_aug(state, k))(keys)
    if not (training and cfg.mlp.use_bn):
        return logps, state

    # each vmapped leaf is n_j = (1-m)*s0 + m*t_j; the sequential chain
    # s_{j+1} = (1-m)*s_j + m*t_j rewrites as repeated
    # s <- (1-m)*s + (n_j - (1-m)*s0) — exactly K torch updates in order
    from grandtpu.nn.mlp import BN_MOMENTUM

    def fold(s0_leaf, nk_leaf):
        out = s0_leaf
        for j in range(cfg.k_aug):
            out = (1.0 - BN_MOMENTUM) * out + (
                nk_leaf[j] - (1.0 - BN_MOMENTUM) * s0_leaf)
        return out

    new_state = jax.tree_util.tree_map(fold, state, states_k)
    return logps, new_state


def _masked_nll(logps_k, labels, mask):
    """Mean over K augs of masked-mean NLL. logps_k [K, B, C]."""
    picked = jnp.take_along_axis(
        logps_k, labels[None, :, None], axis=-1)[..., 0]   # [K, B]
    per_k = -(picked * mask[None]).sum(-1) / jnp.maximum(mask.sum(), 1.0)
    return per_k.mean()


def build_train_step(cfg: StepConfig, optimizer) -> Callable:
    """Returns jitted step(params, state, opt_state, features, tk_cols,
    tk_vals, batch, key, num_batch) -> (params, state, opt_state, metrics).

    features/tk_cols/tk_vals stay device-resident across steps; the host
    ships only batch = dict(rows [B] i32 positions into the top-k table,
    labels [n_train] i32, label_mask [n_train] f32) per step.
    B = n_train + n_unlabeled, both static.
    """

    def loss_fn(params, state, features, tk_cols, tk_vals, batch, key,
                num_batch):
        cols = jnp.take(tk_cols, batch["rows"], axis=0)   # [B, Ktop]
        vals = jnp.take(tk_vals, batch["rows"], axis=0)
        nt = cfg.n_train
        # real-row mask over the whole batch: the reference feeds the true
        # smaller batch (model.py:303); we wrap-pad to a static shape and
        # weight the padding out of BN stats and the consistency loss
        um = batch.get("unlabel_mask")
        if um is None:
            um = jnp.ones(cols.shape[0] - nt, jnp.float32)
        bmask = jnp.concatenate([batch["label_mask"], um])
        logps, new_state = _forward_k(
            params, state, cfg, features, cols, vals, key, training=True,
            batch_mask=bmask if cfg.mlp.use_bn else None)
        sup = _masked_nll(logps[:, :nt], batch["labels"], batch["label_mask"])
        # warmup ramp: min(lam, lam * num_batch / warmup), model.py:329
        ramp = jnp.minimum(cfg.lam, cfg.lam * num_batch / cfg.warmup)
        unsup = consis_loss(logps[:, nt:], cfg.tem, cfg.conf, cfg.loss_kind,
                            row_mask=um)
        loss = sup + ramp * unsup
        # train accuracy on the last augmentation (reference model.py:331)
        preds = jnp.argmax(logps[-1, :nt], axis=-1)
        acc = ((preds == batch["labels"]) * batch["label_mask"]).sum() \
            / jnp.maximum(batch["label_mask"].sum(), 1.0)
        return loss, (new_state, sup, unsup, acc)

    @jax.jit
    def step(params, state, opt_state, features, tk_cols, tk_vals, batch,
             key, num_batch):
        (loss, (new_state, sup, unsup, acc)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, state, features, tk_cols, tk_vals,
                                   batch, key, num_batch)
        # reference measures the grad norm even with clipping disabled
        # (model.py:116-120)
        gnorm = optax.global_norm(grads)
        if cfg.clip_norm > 0:
            scale = jnp.minimum(1.0, cfg.clip_norm / (gnorm + 1e-6))
            grads = jax.tree.map(lambda g: g * scale, grads)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics = {"loss": loss, "sup_loss": sup, "consis_loss": unsup,
                   "train_acc": acc, "grad_norm": gnorm}
        return params, new_state, opt_state, metrics

    return step


def build_eval_step(cfg: StepConfig) -> Callable:
    """Returns jitted evaluate(params, state, features, cols, vals, labels,
    mask) -> (nll, acc). Eval semantics of reference ``valid``
    (``model.py:143-166``): model.eval() makes dropout/DropNode no-ops, so
    the propagation is a plain weighted mean; BN uses running stats."""

    @jax.jit
    def evaluate(params, state, features, tk_cols, tk_vals, rows, labels,
                 mask):
        cols = jnp.take(tk_cols, rows, axis=0)
        vals = jnp.take(tk_vals, rows, axis=0)
        feats = jnp.take(features, cols, axis=0)
        x = random_prop(feats, vals, training=False)
        logits, _ = apply_mlp(params, state, cfg.mlp, x, training=False)
        logps = jax.nn.log_softmax(logits, axis=-1)
        picked = jnp.take_along_axis(logps, labels[:, None], axis=-1)[:, 0]
        denom = jnp.maximum(mask.sum(), 1.0)
        nll = -(picked * mask).sum() / denom
        acc = ((jnp.argmax(logps, -1) == labels) * mask).sum() / denom
        return nll, acc

    return evaluate
