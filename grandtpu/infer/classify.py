"""Batched full-graph classification after exact propagation.

Reference ``get_local_logits`` + the accuracy tail of ``predict``
(``model.py:169-178, 213-224``): run the trained MLP in eval mode over all
nodes in fixed-size chunks, argmax, compare on idx_test.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from grandtpu.nn.mlp import MLPConfig, apply_mlp


@functools.partial(jax.jit, static_argnames=("cfg",))
def _logits_chunk(params, state, cfg: MLPConfig, x):
    logits, _ = apply_mlp(params, state, cfg, x, training=False)
    return logits


def predict_logits(params, state, cfg: MLPConfig, feats,
                   batch_size: int = 10000) -> np.ndarray:
    """MLP logits for all rows of `feats` (device array), chunked."""
    n = feats.shape[0]
    out = []
    # pad every final chunk so ONE compiled program serves any input size
    # (small inputs included — round 1 compiled a second program when
    # n <= batch_size)
    for i in range(0, n, batch_size):
        chunk = feats[i: i + batch_size]
        pad = batch_size - chunk.shape[0]
        if pad > 0:
            chunk = jnp.pad(chunk, ((0, pad), (0, 0)))
        logits = _logits_chunk(params, state, cfg, chunk)
        out.append(np.asarray(logits[: min(batch_size, n - i)]))
    return np.concatenate(out, axis=0)


def test_accuracy(params, state, cfg: MLPConfig, propagated_feats,
                  idx_test: np.ndarray, labels_int: np.ndarray,
                  batch_size: int = 10000) -> float:
    logits = predict_logits(params, state, cfg, propagated_feats, batch_size)
    preds = logits.argmax(axis=1)
    correct = np.equal(preds[idx_test], labels_int[idx_test]).sum()
    return float(correct) / len(idx_test)


def predict_logits_sparse(params, state, cfg: MLPConfig, attr_cols,
                          attr_vals, adj_sl, *, mode: str = "ppr",
                          order: int = 10, alpha: float = 0.2,
                          batch_size: int = 10000,
                          propagate=None,
                          precision: str = "f32") -> np.ndarray:
    """Full-graph logits for the sparse-feature (MAG) model: all-node
    embeddings in chunks -> exact propagation in EMBEDDING space -> head
    (reference ``model_mag.py:192-245``; the memory trick that avoids a
    dense [n, vocab] matrix).

    propagate: optional override ``embs [n, H] -> propagated [n, H]`` —
    the sharded trainers pass the row-partitioned mesh operator here.
    precision: block-SpMM precision for the default propagation path
    ('f32' | 'bf16' | 'int8')."""
    import functools as _ft

    import jax as _jax

    from grandtpu.infer.propagate import exact_propagate
    from grandtpu.nn.mag_mlp import apply_mag_head
    from grandtpu.nn.sparse_input import embed_nodes

    @_ft.partial(_jax.jit)
    def embed_chunk(params, ac, av):
        return embed_nodes(params["emb"], ac, av, training=False)

    @_ft.partial(_jax.jit, static_argnames=("cfg",))
    def head_chunk(params, state, cfg, x):
        logits, _ = apply_mag_head(params, state, cfg, x, training=False)
        return logits

    n = attr_cols.shape[0]
    h = params["emb"]["table"].shape[1]
    embs = np.empty((n, h), np.float32)
    for i in range(0, n, batch_size):
        embs[i: i + batch_size] = np.asarray(embed_chunk(
            params, attr_cols[i: i + batch_size],
            attr_vals[i: i + batch_size]))
    if propagate is None:
        prop = exact_propagate(adj_sl, embs, mode=mode, order=order,
                               alpha=alpha, precision=precision)
    else:
        prop = np.asarray(propagate(embs))
    out = np.empty((n, cfg.num_classes), np.float32)
    for i in range(0, n, batch_size):
        out[i: i + batch_size] = np.asarray(head_chunk(
            params, state, cfg, prop[i: i + batch_size]))
    return out
