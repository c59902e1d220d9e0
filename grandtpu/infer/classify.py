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
    # pad the final chunk so every call shares one compiled program
    for i in range(0, n, batch_size):
        chunk = feats[i: i + batch_size]
        pad = batch_size - chunk.shape[0]
        if pad > 0 and n > batch_size:
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
