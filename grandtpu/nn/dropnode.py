"""DropNode random propagation on padded top-k rows.

Reference semantics (``model.py:80-87``): dropout on the propagation values,
then scatter-sum of weighted neighbor features, normalized by the surviving
weight mass. torch's train-mode 1/(1-p) dropout scaling cancels in that
ratio, so DropNode here is a pure Bernoulli mask on the values — numerics
are then exactly the weighted mean over surviving entries (+1e-12).

TPU formulation: the batch is a static [B, K] block (see
``grandtpu.sparse.topk``), so "scatter-sum per source" is just a reduction
over the K axis — no scatter at all, and the weighted sum over features is a
batched matvec the MXU can chew on.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def random_prop(feats: jnp.ndarray, vals: jnp.ndarray, *,
                key=None, dropnode_rate: float = 0.5,
                training: bool = False) -> jnp.ndarray:
    """Aggregate neighbor features through (optionally dropped) topk weights.

    feats : [B, K, F] gathered neighbor feature rows
    vals  : [B, K] propagation weights (0 on padding slots)
    returns [B, F]
    """
    if training and dropnode_rate > 0.0:
        keep = jax.random.bernoulli(key, 1.0 - dropnode_rate, vals.shape)
        w = jnp.where(keep, vals, 0.0)
    else:
        w = vals
    num = jnp.einsum("bk,bkf->bf", w, feats)
    den = jnp.sum(w, axis=-1, keepdims=True)
    return num / (den + 1e-12)


def gather_and_prop(features: jnp.ndarray, cols: jnp.ndarray,
                    vals: jnp.ndarray, *, key=None,
                    dropnode_rate: float = 0.5,
                    training: bool = False) -> jnp.ndarray:
    """features [N, F] device-resident; cols/vals [B, K] -> [B, F]."""
    feats = jnp.take(features, cols, axis=0)
    return random_prop(feats, vals, key=key, dropnode_rate=dropnode_rate,
                       training=training)
