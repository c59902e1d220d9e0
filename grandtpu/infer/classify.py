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


def embed_all_nodes(params, attr_cols, attr_vals,
                    batch_size: int = 10000) -> np.ndarray:
    """All-node embeddings [n, H] (host numpy), chunked — the first phase
    of sparse predict (reference ``model_mag.py:192-213``). Split out so
    MAG-scale callers can RELEASE the [n, P] attr tables (2.4GB at 12.4M
    nodes) before the propagation phase allocates its [n, H] carries."""
    import functools as _ft

    import jax as _jax
    import jax.numpy as _jnp

    from grandtpu.nn.sparse_input import embed_nodes

    @_ft.partial(_jax.jit)
    def embed_chunk(params, ac, av):
        return embed_nodes(params["emb"], ac, av, training=False)

    n = attr_cols.shape[0]
    h = params["emb"]["table"].shape[1]
    embs = np.empty((n, h), np.float32)
    for i in range(0, n, batch_size):
        ac = attr_cols[i: i + batch_size]
        pad = batch_size - ac.shape[0]
        if pad > 0:   # pad the tail so one compiled program serves all
            ac = _jnp.pad(ac, ((0, pad), (0, 0)))
            av = _jnp.pad(attr_vals[i: i + batch_size], ((0, pad), (0, 0)))
        else:
            av = attr_vals[i: i + batch_size]
        embs[i: i + batch_size] = np.asarray(
            embed_chunk(params, ac, av))[: n - i]
    return embs


def head_logits(params, state, cfg: MLPConfig, prop,
                batch_size: int = 10000) -> np.ndarray:
    """MAG head over propagated embeddings [n, H], chunked — the last
    phase of sparse predict (reference ``model_mag.py:215-245``)."""
    import functools as _ft

    import jax as _jax
    import jax.numpy as _jnp

    from grandtpu.nn.mag_mlp import apply_mag_head

    @_ft.partial(_jax.jit, static_argnames=("cfg",))
    def head_chunk(params, state, cfg, x):
        logits, _ = apply_mag_head(params, state, cfg, x, training=False)
        return logits

    n = prop.shape[0]
    out = np.empty((n, cfg.num_classes), np.float32)
    for i in range(0, n, batch_size):
        x = prop[i: i + batch_size]
        pad = batch_size - x.shape[0]
        if pad > 0:
            x = _jnp.pad(x, ((0, pad), (0, 0)))
        out[i: i + batch_size] = np.asarray(
            head_chunk(params, state, cfg, x))[: n - i]
    return out


def predict_logits_sparse(params, state, cfg: MLPConfig, attr_cols,
                          attr_vals, adj_sl, *, mode: str = "ppr",
                          order: int = 10, alpha: float = 0.2,
                          batch_size: int = 10000,
                          propagate=None,
                          precision: str = "f32") -> np.ndarray:
    """Full-graph logits for the sparse-feature (MAG) model: all-node
    embeddings in chunks -> exact propagation in EMBEDDING space -> head
    (reference ``model_mag.py:192-245``; the memory trick that avoids a
    dense [n, vocab] matrix). Composition of :func:`embed_all_nodes`,
    the propagation, and :func:`head_logits` — MAG-scale callers use the
    phases directly so attr tables can be freed before propagation
    (see trainer_sparse).

    propagate: optional override ``embs [n, H] -> propagated [n, H]`` —
    the sharded trainers pass the row-partitioned mesh operator here.
    precision: block-SpMM precision for the default propagation path
    ('f32' | 'bf16' | 'int8' | 'auto' | 'bf16_carry')."""
    from grandtpu.infer.propagate import exact_propagate

    embs = embed_all_nodes(params, attr_cols, attr_vals, batch_size)
    if propagate is None:
        prop = exact_propagate(adj_sl, embs, mode=mode, order=order,
                               alpha=alpha, precision=precision)
    else:
        prop = np.asarray(propagate(embs))
    return head_logits(params, state, cfg, prop, batch_size)
